/* Hand-written replacement for the gengetopt-generated options.h of the
 * reference (src/options.ggo): just enough of the gengetopt API surface
 * for configuration.c.  Used only to build the REFERENCE pipeline for
 * baseline timing / golden regeneration (tools/refbuild/build_reference.sh);
 * it is not part of this framework's runtime. */

#ifndef OPTIONS_H
#define OPTIONS_H

#ifdef __cplusplus
extern "C" {
#endif

enum enum_retain_externals { retain_externals__NULL = -1,
                             retain_externals_arg_true = 0,
                             retain_externals_arg_false };

struct gengetopt_args_info {
    char *config_file_arg;
    char *config_file_orig;
    unsigned int config_file_given;

    int min_factor_length_arg;
    char *min_factor_length_orig;
    unsigned int min_factor_length_given;

    int min_intron_length_arg;
    char *min_intron_length_orig;
    unsigned int min_intron_length_given;

    int max_intron_length_arg;
    char *max_intron_length_orig;
    unsigned int max_intron_length_given;

    double min_string_depth_rate_arg;
    char *min_string_depth_rate_orig;
    unsigned int min_string_depth_rate_given;

    double max_prefix_discarded_rate_arg;
    char *max_prefix_discarded_rate_orig;
    unsigned int max_prefix_discarded_rate_given;

    double max_suffix_discarded_rate_arg;
    char *max_suffix_discarded_rate_orig;
    unsigned int max_suffix_discarded_rate_given;

    int max_prefix_discarded_arg;
    char *max_prefix_discarded_orig;
    unsigned int max_prefix_discarded_given;

    int max_suffix_discarded_arg;
    char *max_suffix_discarded_orig;
    unsigned int max_suffix_discarded_given;

    int min_distance_of_splice_sites_arg;
    char *min_distance_of_splice_sites_orig;
    unsigned int min_distance_of_splice_sites_given;

    int max_no_of_factorizations_arg;
    char *max_no_of_factorizations_orig;
    unsigned int max_no_of_factorizations_given;

    double max_difference_of_coverage_arg;
    char *max_difference_of_coverage_orig;
    unsigned int max_difference_of_coverage_given;

    int max_difference_of_no_of_exons_arg;
    char *max_difference_of_no_of_exons_orig;
    unsigned int max_difference_of_no_of_exons_given;

    int max_difference_of_gap_length_arg;
    char *max_difference_of_gap_length_orig;
    unsigned int max_difference_of_gap_length_given;

    double complexity_threshold_arg;
    char *complexity_threshold_orig;
    unsigned int complexity_threshold_given;

    enum enum_retain_externals retain_externals_arg;
    char *retain_externals_orig;
    unsigned int retain_externals_given;

    int max_pairings_in_CMEG_arg;
    char *max_pairings_in_CMEG_orig;
    unsigned int max_pairings_in_CMEG_given;

    double max_shortest_pairing_frequence_arg;
    char *max_shortest_pairing_frequence_orig;
    unsigned int max_shortest_pairing_frequence_given;

    int suff_pref_length_intron_arg;
    char *suff_pref_length_intron_orig;
    unsigned int suff_pref_length_intron_given;

    int suff_pref_length_est_arg;
    char *suff_pref_length_est_orig;
    unsigned int suff_pref_length_est_given;

    int suff_pref_length_genomic_arg;
    char *suff_pref_length_genomic_orig;
    unsigned int suff_pref_length_genomic_given;

    int no_transitive_reduction_flag;
    int no_short_edge_compaction_flag;

    long max_single_factorization_time_arg;
    char *max_single_factorization_time_orig;
    unsigned int max_single_factorization_time_given;
};

struct cmdline_parser_params {
    int override;
    int initialize;
    int check_required;
    int check_ambiguity;
    int print_errors;
};

struct cmdline_parser_params *cmdline_parser_params_create(void);
int cmdline_parser_ext(int argc, char **argv,
                       struct gengetopt_args_info *args_info,
                       struct cmdline_parser_params *params);
int cmdline_parser_config_file(const char *filename,
                               struct gengetopt_args_info *args_info,
                               struct cmdline_parser_params *params);
int cmdline_parser_required(struct gengetopt_args_info *args_info,
                            const char *prog_name);
int cmdline_parser_file_save(const char *filename,
                             struct gengetopt_args_info *args_info);
void cmdline_parser_free(struct gengetopt_args_info *args_info);

#ifdef __cplusplus
}
#endif
#endif /* OPTIONS_H */
