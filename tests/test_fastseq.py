"""Sequence I/O round-trip tests.

Mirrors the reference's testfasta/testfastq golden runs (Makefile:109-115):
reading a file and re-writing it must reproduce the committed goldens,
including the truncated-quality -> no-quality degradation.
"""

import io

from quaff_tpu.io import (
    FastSeq,
    KmerIndex,
    add_revcomps,
    duplicate_names,
    read_fast_seqs,
    read_indexed_fast_seq,
    write_fasta,
    write_fastq,
)


def _fasta_str(seqs):
    out = io.StringIO()
    write_fasta(out, seqs)
    return out.getvalue()


def _fastq_str(seqs):
    out = io.StringIO()
    write_fastq(out, seqs)
    return out.getvalue()


def test_fasta_roundtrip(data_dir):
    seqs = read_fast_seqs(str(data_dir / "tiny.fasta"))
    assert _fasta_str(seqs) == (data_dir / "tiny.fasta").read_text()


def test_fastq_to_fasta(data_dir):
    seqs = read_fast_seqs(str(data_dir / "tiny.fastq"))
    assert _fasta_str(seqs) == (data_dir / "tiny.fasta").read_text()


def test_fastq_roundtrip(data_dir):
    seqs = read_fast_seqs(str(data_dir / "tiny.fastq"))
    assert _fastq_str(seqs) == (data_dir / "tiny.fastq").read_text()


def test_fasta_to_noqual_fastq(data_dir):
    seqs = read_fast_seqs(str(data_dir / "tiny.fasta"))
    assert _fastq_str(seqs) == (data_dir / "tiny.noqual.fastq").read_text()


def test_noqual_fastq_roundtrip(data_dir):
    seqs = read_fast_seqs(str(data_dir / "tiny.noqual.fastq"))
    assert _fastq_str(seqs) == (data_dir / "tiny.noqual.fastq").read_text()


def test_truncated_qual_degrades_to_noqual(data_dir):
    seqs = read_fast_seqs(str(data_dir / "tiny.truncated.fastq"))
    assert _fastq_str(seqs) == (data_dir / "tiny.noqual.fastq").read_text()


def test_gzip_read(data_dir):
    seqs = read_fast_seqs(str(data_dir / "c8f30.fastq.gz"))
    assert len(seqs) == 1
    assert len(seqs[0].seq) == 6604
    assert seqs[0].has_qual()
    assert seqs[0].name.startswith("channel_8_read_24")


def test_indexed_read(data_dir):
    seqs = read_fast_seqs(str(data_dir / "c8f30.fastq.gz"))
    rec = read_indexed_fast_seq(str(data_dir / "c8f30.fastq.gz"), seqs[0].filepos)
    assert rec.seq == seqs[0].seq
    assert rec.qual == seqs[0].qual


def test_revcomp_provenance():
    fs = FastSeq(name="s", seq="ACGT", qual="abcd")
    rc = fs.revcomp()
    assert rc.seq == "ACGT"  # ACGT is its own revcomp
    assert rc.qual == "dcba"
    assert rc.name == "revcomp(s)"
    assert rc.source.rev and rc.source.name == "s"
    assert rc.source.start == 1 and rc.source.end == 4
    # double revcomp provenance composes back to forward strand
    rc2 = rc.revcomp()
    assert rc2.source.rev is False


def test_add_revcomps_and_dups():
    seqs = [FastSeq(name="a", seq="ACGT"), FastSeq(name="b", seq="GGCC")]
    both = add_revcomps(seqs)
    assert len(both) == 4
    assert both[2].name == "revcomp(a)"
    assert duplicate_names(both) == set()
    assert duplicate_names(seqs + seqs) == {"a", "b"}


def test_kmer_index():
    fs = FastSeq(name="s", seq="ACGTACGT")
    idx = KmerIndex(fs, 4)
    # ACGT occurs at 0 and 4
    from quaff_tpu.alphabet import string_to_kmer
    import numpy as np

    code = string_to_kmer("ACGT")
    hits = idx.sorted_positions[np.searchsorted(idx.sorted_codes, code, "left"):
                                np.searchsorted(idx.sorted_codes, code, "right")]
    assert sorted(hits.tolist()) == [0, 4]
