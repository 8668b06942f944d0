"""Preprocessing-layer tests against golden reference behavior."""

import io

from pintron_tpu.io import multifasta as mf


def test_read_multifasta_basic():
    fh = io.StringIO(">seq1 /gb=AB123\nACGT\nacgt\n>seq2\nTTTT\n")
    recs = mf.read_multifasta(fh)
    assert len(recs) == 2
    assert recs[0].est_id == "seq1 /gb=AB123"
    assert recs[0].seq == "ACGTacgt"
    assert recs[0].original_seq == "ACGTacgt"
    assert recs[1].seq == "TTTT"


def test_read_multifasta_separator():
    fh = io.StringIO(">a\nAC\nGT\n#\\#\n>b\nGG\n")
    recs = mf.read_multifasta(fh)
    assert [r.seq for r in recs] == ["ACGT", "GG"]


def test_gb_identification():
    est = mf.EstInfo(est_id="x /gb=BC017398.2 /clone_end=3 /len=100")
    mf.set_est_gb_identification(est)
    assert est.gb == "BC017398.2"
    est2 = mf.EstInfo(est_id="no gb here")
    mf.set_est_gb_identification(est2)
    assert est2.gb is None


def test_parse_genomic_header():
    gen = mf.EstInfo(est_id="chr4:71457975:71473005:1", seq="ACGT")
    mf.parse_genomic_header(gen)
    assert gen.chromosome == "chr4"
    assert gen.abs_start == 71457975
    assert gen.abs_end == 71473005
    assert gen.strand == 1

    neg = mf.EstInfo(est_id="chr13:45525098:45577212:-1", seq="ACGT")
    mf.parse_genomic_header(neg)
    assert neg.strand == -1

    plus = mf.EstInfo(est_id="chrX:152635145:153973591:+1", seq="ACGT")
    mf.parse_genomic_header(plus)
    assert plus.strand == 1
    assert plus.strand_as_read == "+1"

    bad = mf.EstInfo(est_id="some random header", seq="ACGTACGT")
    mf.parse_genomic_header(bad)
    assert bad.chromosome == "unknown"
    assert bad.abs_start == 1
    assert bad.abs_end == 8


def test_reverse_complement():
    est = mf.EstInfo(seq="AACGTN", original_seq="AACGTN")
    mf.reverse_and_complement(est)
    assert est.seq == "NACGTT"
    assert est.original_seq == "NACGTT"


def test_strand_and_rc_refseq():
    est = mf.EstInfo(est_id="h /gb=NM_016519", gb="NM_016519",
                     seq="ACGT", original_seq="ACGT")
    mf.set_est_strand_and_rc(est, mf.EstInfo())
    assert est.strand == 1 and est.fixed_strand


def test_strand_and_rc_clone_end_5():
    est = mf.EstInfo(est_id="h /gb=X1 /clone_end=5", gb="X1",
                     seq="AACC", original_seq="AACC")
    mf.set_est_strand_and_rc(est, mf.EstInfo())
    assert est.strand == -1
    assert est.seq == "GGTT"
    assert not est.fixed_strand


def test_polya_masking_simple():
    # 20 A's tail after a mixed prefix long enough not to trigger at start.
    seq = "CGTCGTCGCGGTCGCGGTCG" + "A" * 20
    est = mf.EstInfo(seq=seq, original_seq=seq)
    mf.polyat_substitution(est)
    assert est.suff_polyA_length == 20
    assert est.seq.endswith("*" * 20)
    assert est.pref_polyA_length == -1
    assert est.original_seq == seq  # original untouched


def test_polya_short_sequence_untouched():
    est = mf.EstInfo(seq="AAAAAAA", original_seq="AAAAAAA")
    mf.polyat_substitution(est)
    assert est.seq == "AAAAAAA"
    assert est.pref_polyA_length == -1


def test_polyt_prefix():
    seq = "T" * 16 + "GCGGTCGCGGTCGCGGACGC"
    est = mf.EstInfo(seq=seq, original_seq=seq)
    mf.polyat_substitution(est)
    assert est.pref_polyT_length == 16
    assert est.seq.startswith("#" * 16)


def test_ntails_removal():
    gen = mf.EstInfo(seq="NNNACGTNN", original_seq="NNNACGTNN")
    mf.ntails_removal(gen)
    assert gen.seq == "ACGT"
    assert gen.pref_N_length == 3
    assert gen.suff_N_length == 2
    assert gen.original_seq == "NNNACGTNN"


def test_config_roundtrip(tmp_path):
    from pintron_tpu.config import Config

    cfg = Config().validate()
    p = tmp_path / "config-dump.ini"
    cfg.dump_ini(str(p))
    cfg2 = Config.from_ini(str(p))
    assert cfg == cfg2
