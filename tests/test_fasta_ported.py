"""FASTA reader/writer tests ported from the reference's inline suite
(packages/pangraph/src/io/fasta.rs:296-940). Our reader is file-based, so
fixtures are written to tmp files; `rd()` returns records."""
from __future__ import annotations

import textwrap

import pytest

from pangraph_tpu.graph.seq import to_str
from pangraph_tpu.io.fasta import FastaError, FastaRecord, read_fasta, write_fasta


@pytest.fixture
def rd(tmp_path):
    def _read(data: str, validate: bool = True):
        p = tmp_path / "in.fa"
        p.write_text(data)
        return read_fasta(str(p), validate=validate)

    return _read


def S(rec):
    return to_str(rec.seq)


def test_fasta_reader_fail_on_non_fasta(rd):
    # fasta.rs:302-311: text without any '>' header is an error
    with pytest.raises(FastaError, match="no FASTA records"):
        rd("This is not a valid FASTA string.\nIt is not empty\nno header here\n")


def test_fasta_reader_fail_on_unknown_char(rd):
    # fasta.rs:314-323
    with pytest.raises(FastaError, match="invalid sequence"):
        rd(">seq1\nACGT%ACGT\n")


def test_fasta_reader_read_empty(rd):
    # fasta.rs:325-334 yields an empty record; our multi-record reader
    # reports the empty input as a clean error instead
    with pytest.raises(FastaError, match="no FASTA records"):
        rd("")


def test_fasta_reader_read_whitespace_only(rd):
    # fasta.rs:336-345
    with pytest.raises(FastaError, match="no FASTA records"):
        rd("\n \n \n\n")


@pytest.mark.parametrize(
    "data",
    [
        ">seq1\nATCG\n",
        "\n>seq1\nATCG\n",
        "\n\n\n>seq1\nATCG\n",
        ">seq1\nATCG",
        ">seq1\nATCG\n\n",
    ],
    ids=["plain", "leading_newline", "multiple_leading_newlines",
         "no_trailing_newline", "trailing_blank_line"],
)
def test_fasta_reader_read_single_record_variants(rd, data):
    # fasta.rs:347-397, 439-450
    (rec,) = rd(data)
    assert rec.seq_name == "seq1" and S(rec) == "ATCG" and rec.index == 0


def test_fasta_reader_read_multiple_records(rd):
    # fasta.rs:399-417
    r1, r2 = rd(">seq1\nATCG\n>seq2\nGCTA\n")
    assert (r1.seq_name, S(r1), r1.index) == ("seq1", "ATCG", 0)
    assert (r2.seq_name, S(r2), r2.index) == ("seq2", "GCTA", 1)


def test_fasta_reader_read_empty_lines_between_records(rd):
    # fasta.rs:419-437
    r1, r2 = rd("\n>seq1\n\nATCG\n\n\n>seq2\nGCTA\n\n")
    assert (r1.seq_name, S(r1), r1.index) == ("seq1", "ATCG", 0)
    assert (r2.seq_name, S(r2), r2.index) == ("seq2", "GCTA", 1)


def test_fasta_reader_example_1(rd):
    # fasta.rs:452-481
    r1, r2 = rd("\n\n>a\nACGCTCGATC\n\n>b\nCCGCGC")
    assert (r1.seq_name, S(r1)) == ("a", "ACGCTCGATC")
    assert (r2.seq_name, S(r2)) == ("b", "CCGCGC")


def test_fasta_reader_name_desc(rd):
    # fasta.rs:569-597: first whitespace splits name from description
    r1, r2 = rd(">Identifier Description\nACGT\n>Identifier Description with spaces\nACGT\n")
    assert (r1.seq_name, r1.desc) == ("Identifier", "Description")
    assert (r2.seq_name, r2.desc) == ("Identifier", "Description with spaces")


def test_fasta_reader_dedent_nuc(rd):
    # fasta.rs:600-678: odd names, a space-led header yielding an empty
    # name with a description, and a misindented header
    data = textwrap.dedent(
        """\
        >FluBuster-001
        ACAGCCATGTATTG--
        >CommonCold-AB
        ACATCCCTGTA-TG--
        >Ecoli/Joke/2024|XD
        ACATCGCCNNA--GAC

        >Sniffles-B
        GCATCCCTGTA-NG--
        > SneezeC-19
        CCGGCGATGTRTTG--
          >MisindentedVirus|D-skew
          TCGGCCGTGTRTTG--
        """
    )
    recs = rd(data)
    got = [(r.seq_name, r.desc, S(r), r.index) for r in recs]
    assert got == [
        ("FluBuster-001", None, "ACAGCCATGTATTG--", 0),
        ("CommonCold-AB", None, "ACATCCCTGTA-TG--", 1),
        ("Ecoli/Joke/2024|XD", None, "ACATCGCCNNA--GAC", 2),
        ("Sniffles-B", None, "GCATCCCTGTA-NG--", 3),
        ("", "SneezeC-19", "CCGGCGATGTRTTG--", 4),
        ("MisindentedVirus|D-skew", None, "TCGGCCGTGTRTTG--", 5),
    ]


def test_fasta_reader_multiline_and_skewed_indentation(rd):
    # fasta.rs:681-746: case folding, multiline concat, skewed indentation
    data = textwrap.dedent(
        """\
        >MixedCaseSeq
        aCaGcCAtGtAtTG--
        >LowercaseSeq
        acagccatgtattg--
        >UppercaseSeq
        ACAGCCATGTATTG--
        >MultilineSeq
        ACAGCC
        ATGT
        ATTG--
        >SkewedIndentSeq
          ACAGCC
        ATGTATTG
         ATTG--
        """
    )
    recs = rd(data)
    got = [(r.seq_name, S(r)) for r in recs]
    assert got == [
        ("MixedCaseSeq", "ACAGCCATGTATTG--"),
        ("LowercaseSeq", "ACAGCCATGTATTG--"),
        ("UppercaseSeq", "ACAGCCATGTATTG--"),
        ("MultilineSeq", "ACAGCCATGTATTG--"),
        ("SkewedIndentSeq", "ACAGCCATGTATTGATTG--"),
    ]


def test_fasta_reader_invalid_char_at_start(rd):
    # fasta.rs:840-849
    with pytest.raises(FastaError, match="invalid sequence"):
        rd(">seq1\n%ACGT\n")


def test_fasta_reader_invalid_char_at_end(rd):
    # fasta.rs:851-860
    with pytest.raises(FastaError, match="invalid sequence"):
        rd(">seq1\nACGT%\n")


def test_fasta_reader_empty_sequence_name(rd):
    # fasta.rs:862-873
    (rec,) = rd(">\nACGT\n")
    assert rec.seq_name == "" and rec.desc is None and S(rec) == "ACGT"


def test_fasta_reader_only_space_in_header(rd):
    # fasta.rs:875-886
    (rec,) = rd("> \nACGT\n")
    assert rec.seq_name == "" and rec.desc is None and S(rec) == "ACGT"


def test_fasta_reader_iupac_ambiguity_codes(rd):
    # fasta.rs:888-897
    (rec,) = rd(">seq1\nACGTYRWSKMDVHBN\n")
    assert rec.seq_name == "seq1" and S(rec) == "ACGTYRWSKMDVHBN"


def test_read_many_fasta_general_case(rd):
    # fasta.rs:907-940
    recs = rd(">a\nACGT\n>b\nGCTA\n>c\nTGCA\n")
    assert [(r.seq_name, S(r), r.index) for r in recs] == [
        ("a", "ACGT", 0), ("b", "GCTA", 1), ("c", "TGCA", 2)
    ]


def test_fasta_writer_multiple_records(rd, tmp_path):
    # fasta.rs:804-814: write then re-read round-trips; long sequences wrap
    recs = rd(">a D1\n" + "ACGT" * 50 + "\n>b\nGCTA\n")
    out = tmp_path / "out.fa"
    write_fasta(str(out), recs)
    text = out.read_text()
    assert text.startswith(">a D1\n")
    assert max(len(l) for l in text.splitlines()) <= 80  # 80-column wrap
    back = read_fasta(str(out))
    assert [(r.seq_name, r.desc, S(r)) for r in back] == [
        (r.seq_name, r.desc, S(r)) for r in recs
    ]


def test_multi_file_concat_no_trailing_newline(tmp_path):
    """io/concat.rs behavior at our level: reading multiple files must not
    merge records across a file boundary even when the first file lacks a
    trailing newline (the reference splices a delimiter between streams;
    our reader opens files separately — same observable result)."""
    f1 = tmp_path / "a.fa"
    f1.write_text(">a\nACGT")  # no trailing newline
    f2 = tmp_path / "b.fa"
    f2.write_text(">b\nGGCC\n")
    recs = read_fasta([str(f1), str(f2)])
    assert [(r.seq_name, S(r), r.index) for r in recs] == [("a", "ACGT", 0), ("b", "GGCC", 1)]


def test_multi_file_concat_empty_file_errors(tmp_path):
    """A record-less file in a multi-file read is reported with its path
    (concat.rs empty-stream cases, surfaced as our per-file error)."""
    f1 = tmp_path / "a.fa"
    f1.write_text(">a\nACGT\n")
    f2 = tmp_path / "empty.fa"
    f2.write_text("\n\n")
    with pytest.raises(FastaError, match="empty.fa"):
        read_fasta([str(f1), str(f2)])
