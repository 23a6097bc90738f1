"""FASTQ robustness (VERDICT r4 weak #6): multi-line records and CRLF
must parse identically in the native (fastx.cpp) and Python
(io/bank.py) parsers, and malformed input must raise an error instead
of silently mis-parsing."""

import gzip

import numpy as np
import pytest

from simka_tpu.io import native
from simka_tpu.io.bank import read_sequences


def _native_reads(path):
    if not native.available():
        pytest.skip("native parser unavailable")
    return list(native.iter_raw_reads(str(path)))


GOOD_4LINE = b"@r1\nACGTACGT\n+\nFFFFFFFF\n@r2\nTTTTGGGG\n+r2\n########\n"
MULTILINE = (
    b"@r1\nACGT\nACGT\n+\nFFFF\nFFFF\n"  # split seq AND split quals
    b"@r2\nTTTT\n+\n@@@@\n"  # quality line starting with '@'
    b"@r3\nCCCC\n+\n++++\n"  # quality line starting with '+'
)
CRLF = GOOD_4LINE.replace(b"\n", b"\r\n")


@pytest.mark.parametrize(
    "payload,expect",
    [
        (GOOD_4LINE, [b"ACGTACGT", b"TTTTGGGG"]),
        (MULTILINE, [b"ACGTACGT", b"TTTT", b"CCCC"]),
        (CRLF, [b"ACGTACGT", b"TTTTGGGG"]),
    ],
    ids=["plain", "multiline", "crlf"],
)
@pytest.mark.parametrize("gz", [False, True])
def test_both_parsers_agree(tmp_path, payload, expect, gz):
    p = tmp_path / ("r.fastq.gz" if gz else "r.fastq")
    p.write_bytes(gzip.compress(payload) if gz else payload)
    assert read_sequences(str(p)) == expect
    assert _native_reads(p) == expect


@pytest.mark.parametrize(
    "payload,msg",
    [
        (b"@r1\nACGT\n+\nFFFF\nKr2\nTTTT\n+\nFFFF\n", "does not start"),
        (b"@r1\nACGT\n", "missing"),
        (b"@r1\nACGT\n+\nFF", "truncated qualities"),
        (b"@r1\nACGT\n+\nFFFFF\n@r2\nAAAA\n+\nFFFF\n", "quality length"),
    ],
    ids=["bad-header", "no-plus", "short-qual", "long-qual"],
)
def test_malformed_raises_everywhere(tmp_path, payload, msg):
    p = tmp_path / "bad.fastq"
    p.write_bytes(payload)
    with pytest.raises(ValueError, match=msg):
        read_sequences(str(p))
    if native.available():
        with pytest.raises(ValueError, match="malformed FASTQ"):
            _native_reads(p)
        with pytest.raises(ValueError, match="malformed FASTQ"):
            native.count_reads(str(p))
        with pytest.raises(ValueError, match="malformed FASTQ"):
            list(native.iter_packed_batches(str(p), 256, kmer_size=4))


def test_malformed_long_qual_detail():
    """The long-qual case terminates when qlen exceeds seq len; both
    parsers must report the length mismatch, not absorb the next
    record's header into the qualities."""
    # covered by the parametrized case above; kept as documentation
    # of the failure mode the old 4-line parsers had


def test_crlf_fasta(tmp_path):
    p = tmp_path / "r.fasta"
    p.write_bytes(b">r1\r\nACGT\r\nACGT\r\n>r2\r\nTTTT\r\n")
    expect = [b"ACGTACGT", b"TTTT"]
    assert read_sequences(str(p)) == expect
    assert _native_reads(p) == expect
