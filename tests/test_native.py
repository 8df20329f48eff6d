"""Native (C++) data-kernel tests; skip when no compiler/library."""

import numpy as np
import pytest

from orca_tpu.data import genome as g
from orca_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_onehot_matches_numpy():
    codes = g.codes_from_str("ACGTNacgtn" * 100)
    np.testing.assert_array_equal(
        native.codes_to_onehot(codes), g.codes_to_encoding(codes)
    )


def test_onehot_rc_matches_numpy():
    codes = g.codes_from_str("ACGTNGGCCA" * 50)
    want = g.codes_to_encoding(codes)[::-1, ::-1]
    np.testing.assert_array_equal(native.codes_to_onehot(codes, rc=True), want)


def test_fasta_to_codes(tmp_path):
    fa = tmp_path / "toy.fa"
    fa.write_text(">chrA description\nACGTACGT\nGGCC\n>chrB\nTTTTAAAA\n")
    codes, chroms = native.fasta_to_codes(str(fa))
    assert chroms == [("chrA", 0, 12), ("chrB", 12, 20)]
    np.testing.assert_array_equal(
        codes[:12], g.codes_from_str("ACGTACGTGGCC")
    )


def test_batch_gather():
    gen = g.codes_from_str("ACGTACGTGGCCAATT")
    out = native.onehot_batch_gather(
        gen, np.array([0, 4, -2, 14]), np.array([0, 1, 0, 0]), 6
    )
    np.testing.assert_array_equal(out[0], g.codes_to_encoding(gen[:6]))
    np.testing.assert_array_equal(
        out[1], g.codes_to_encoding(gen[4:10])[::-1, ::-1]
    )
    assert (out[2][:2] == 0.25).all()  # left out-of-bounds pad
    assert (out[3][2:] == 0.25).all()  # right out-of-bounds pad


def test_genome_uses_native_path():
    gen = g.CodeGenome({"chr1": g.codes_from_str("ACGTACGTGG")})
    enc = gen.get_encoding_from_coords("chr1", 0, 10)
    np.testing.assert_array_equal(enc, g.codes_to_encoding(gen.get_codes("chr1", 0, 10)))
