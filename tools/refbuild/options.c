/* Hand-written replacement for the gengetopt-generated options.c of the
 * reference (defaults per src/options.ggo:94-370).  Supports the subset
 * the pipeline actually uses: defaults initialization, `name value` /
 * `name = "value"` config files, long CLI options, and a
 * config-dump-style file save.  Build-support only (see options.h). */

#include "options.h"

#include <ctype.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static char *xstrdup(const char *s) {
    char *r = malloc(strlen(s) + 1);
    if (r) strcpy(r, s);
    return r;
}

static void set_defaults(struct gengetopt_args_info *a) {
    memset(a, 0, sizeof(*a));
    a->config_file_arg = xstrdup("config.ini");
    a->min_factor_length_arg = 15;
    a->min_intron_length_arg = 40;
    a->max_intron_length_arg = 0;
    a->min_string_depth_rate_arg = 0.2;
    a->max_prefix_discarded_rate_arg = 0.60;
    a->max_suffix_discarded_rate_arg = 0.60;
    a->max_prefix_discarded_arg = 50;
    a->max_suffix_discarded_arg = 50;
    a->min_distance_of_splice_sites_arg = 50;
    a->max_no_of_factorizations_arg = 0;
    a->max_difference_of_coverage_arg = 0.05;
    a->max_difference_of_no_of_exons_arg = 5;
    a->max_difference_of_gap_length_arg = 20;
    a->complexity_threshold_arg = 20.0;
    a->retain_externals_arg = retain_externals_arg_true;
    a->max_pairings_in_CMEG_arg = 80;
    a->max_shortest_pairing_frequence_arg = 0.4;
    a->suff_pref_length_intron_arg = 70;
    a->suff_pref_length_est_arg = 30;
    a->suff_pref_length_genomic_arg = 30;
    a->no_transitive_reduction_flag = 0;
    a->no_short_edge_compaction_flag = 0;
    a->max_single_factorization_time_arg = 900;
}

struct cmdline_parser_params *cmdline_parser_params_create(void) {
    struct cmdline_parser_params *p = calloc(1, sizeof(*p));
    if (p) {
        p->override = 1;
        p->initialize = 1;
        p->check_required = 1;
    }
    return p;
}

/* apply one (name, value) pair; returns 0 on success */
static int apply_option(struct gengetopt_args_info *a, const char *name,
                        const char *val) {
#define INT_OPT(nm, fld) \
    if (strcmp(name, nm) == 0) { a->fld##_arg = atoi(val); \
        a->fld##_given = 1; return 0; }
#define LONG_OPT(nm, fld) \
    if (strcmp(name, nm) == 0) { a->fld##_arg = atol(val); \
        a->fld##_given = 1; return 0; }
#define DBL_OPT(nm, fld) \
    if (strcmp(name, nm) == 0) { a->fld##_arg = atof(val); \
        a->fld##_given = 1; return 0; }

    if (strcmp(name, "config-file") == 0) {
        free(a->config_file_arg);
        a->config_file_arg = xstrdup(val);
        a->config_file_given = 1;
        return 0;
    }
    INT_OPT("min-factor-length", min_factor_length)
    INT_OPT("min-intron-length", min_intron_length)
    INT_OPT("max-intron-length", max_intron_length)
    DBL_OPT("min-string-depth-rate", min_string_depth_rate)
    DBL_OPT("max-prefix-discarded-rate", max_prefix_discarded_rate)
    DBL_OPT("max-suffix-discarded-rate", max_suffix_discarded_rate)
    INT_OPT("max-prefix-discarded", max_prefix_discarded)
    INT_OPT("max-suffix-discarded", max_suffix_discarded)
    INT_OPT("min-distance-of-splice-sites", min_distance_of_splice_sites)
    INT_OPT("max-no-of-factorizations", max_no_of_factorizations)
    DBL_OPT("max-difference-of-coverage", max_difference_of_coverage)
    INT_OPT("max-difference-of-no-of-exons", max_difference_of_no_of_exons)
    INT_OPT("max-difference-of-gap-length", max_difference_of_gap_length)
    DBL_OPT("complexity-threshold", complexity_threshold)
    INT_OPT("max-pairings-in-CMEG", max_pairings_in_CMEG)
    DBL_OPT("max-shortest-pairing-frequence", max_shortest_pairing_frequence)
    INT_OPT("suff-pref-length-intron", suff_pref_length_intron)
    INT_OPT("suff-pref-length-est", suff_pref_length_est)
    INT_OPT("suff-pref-length-genomic", suff_pref_length_genomic)
    LONG_OPT("max-single-factorization-time", max_single_factorization_time)
    if (strcmp(name, "retain-externals") == 0) {
        a->retain_externals_arg = strcmp(val, "false") == 0
            ? retain_externals_arg_false : retain_externals_arg_true;
        a->retain_externals_given = 1;
        return 0;
    }
    if (strcmp(name, "no-transitive-reduction") == 0) {
        a->no_transitive_reduction_flag = 1;
        return 0;
    }
    if (strcmp(name, "no-short-edge-compaction") == 0) {
        a->no_short_edge_compaction_flag = 1;
        return 0;
    }
    fprintf(stderr, "options shim: unknown option '%s'\n", name);
    return 1;
#undef INT_OPT
#undef LONG_OPT
#undef DBL_OPT
}

int cmdline_parser_ext(int argc, char **argv,
                       struct gengetopt_args_info *args_info,
                       struct cmdline_parser_params *params) {
    int i;
    if (!params || params->initialize) set_defaults(args_info);
    for (i = 1; i < argc; i++) {
        const char *arg = argv[i];
        char name[128];
        const char *eq;
        if (strncmp(arg, "--", 2) != 0) continue;  /* no short opts used */
        arg += 2;
        eq = strchr(arg, '=');
        if (eq) {
            size_t n = (size_t)(eq - arg);
            if (n >= sizeof(name)) n = sizeof(name) - 1;
            memcpy(name, arg, n);
            name[n] = 0;
            if (apply_option(args_info, name, eq + 1)) return 1;
        } else {
            /* flag, or option with the value in the next argv */
            if (strcmp(arg, "no-transitive-reduction") == 0
                || strcmp(arg, "no-short-edge-compaction") == 0) {
                apply_option(args_info, arg, "");
            } else if (i + 1 < argc) {
                if (apply_option(args_info, arg, argv[++i])) return 1;
            }
        }
    }
    return 0;
}

int cmdline_parser_config_file(const char *filename,
                               struct gengetopt_args_info *args_info,
                               struct cmdline_parser_params *params) {
    FILE *f = fopen(filename, "r");
    char line[1024];
    (void)params;
    if (!f) return 0;
    while (fgets(line, sizeof(line), f)) {
        char *p = line, *name, *val, *end;
        while (isspace((unsigned char)*p)) p++;
        if (*p == 0 || *p == '#') continue;
        name = p;
        while (*p && !isspace((unsigned char)*p) && *p != '=') p++;
        if (*p) {
            *p = 0;
            p++;
        }
        while (*p && (isspace((unsigned char)*p) || *p == '=')) p++;
        val = p;
        if (*val == '"') {
            val++;
            end = strchr(val, '"');
            if (end) *end = 0;
        } else {
            end = val + strlen(val);
            while (end > val && isspace((unsigned char)end[-1])) end--;
            *end = 0;
        }
        apply_option(args_info, name, val);
    }
    fclose(f);
    return 0;
}

int cmdline_parser_required(struct gengetopt_args_info *args_info,
                            const char *prog_name) {
    (void)args_info;
    (void)prog_name;
    return 0;
}

int cmdline_parser_file_save(const char *filename,
                             struct gengetopt_args_info *a) {
    FILE *f = fopen(filename, "w");
    if (!f) return 1;
#define SAVE(nm, fld) \
    if (a->fld##_given && a->fld##_orig) \
        fprintf(f, "%s=\"%s\"\n", nm, a->fld##_orig);
    SAVE("config-file", config_file)
    SAVE("min-factor-length", min_factor_length)
    SAVE("min-intron-length", min_intron_length)
    SAVE("max-intron-length", max_intron_length)
    SAVE("min-string-depth-rate", min_string_depth_rate)
    SAVE("max-prefix-discarded-rate", max_prefix_discarded_rate)
    SAVE("max-suffix-discarded-rate", max_suffix_discarded_rate)
    SAVE("max-prefix-discarded", max_prefix_discarded)
    SAVE("max-suffix-discarded", max_suffix_discarded)
    SAVE("min-distance-of-splice-sites", min_distance_of_splice_sites)
    SAVE("max-no-of-factorizations", max_no_of_factorizations)
    SAVE("max-difference-of-coverage", max_difference_of_coverage)
    SAVE("max-difference-of-no-of-exons", max_difference_of_no_of_exons)
    SAVE("max-difference-of-gap-length", max_difference_of_gap_length)
    SAVE("complexity-threshold", complexity_threshold)
    SAVE("retain-externals", retain_externals)
    SAVE("max-pairings-in-CMEG", max_pairings_in_CMEG)
    SAVE("max-shortest-pairing-frequence", max_shortest_pairing_frequence)
    SAVE("suff-pref-length-intron", suff_pref_length_intron)
    SAVE("suff-pref-length-est", suff_pref_length_est)
    SAVE("suff-pref-length-genomic", suff_pref_length_genomic)
    SAVE("max-single-factorization-time", max_single_factorization_time)
    if (a->no_transitive_reduction_flag)
        fprintf(f, "no-transitive-reduction\n");
    if (a->no_short_edge_compaction_flag)
        fprintf(f, "no-short-edge-compaction\n");
#undef SAVE
    fclose(f);
    return 0;
}

void cmdline_parser_free(struct gengetopt_args_info *a) {
#define FREE1(fld) free(a->fld##_orig); a->fld##_orig = NULL;
    free(a->config_file_arg);
    a->config_file_arg = NULL;
    FREE1(config_file)
    FREE1(min_factor_length)
    FREE1(min_intron_length)
    FREE1(max_intron_length)
    FREE1(min_string_depth_rate)
    FREE1(max_prefix_discarded_rate)
    FREE1(max_suffix_discarded_rate)
    FREE1(max_prefix_discarded)
    FREE1(max_suffix_discarded)
    FREE1(min_distance_of_splice_sites)
    FREE1(max_no_of_factorizations)
    FREE1(max_difference_of_coverage)
    FREE1(max_difference_of_no_of_exons)
    FREE1(max_difference_of_gap_length)
    FREE1(complexity_threshold)
    FREE1(retain_externals)
    FREE1(max_pairings_in_CMEG)
    FREE1(max_shortest_pairing_frequence)
    FREE1(suff_pref_length_intron)
    FREE1(suff_pref_length_est)
    FREE1(suff_pref_length_genomic)
    FREE1(max_single_factorization_time)
#undef FREE1
}
