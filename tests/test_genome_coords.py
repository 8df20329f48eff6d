"""Genome store and coordinate-helper tests."""

import numpy as np
import pytest

from orca_tpu.data import genome as g
from orca_tpu.utils.coords import coord_clip, coord_round


def test_sequence_to_encoding():
    enc = g.sequence_to_encoding("ACGTN")
    np.testing.assert_array_equal(enc[0], [1, 0, 0, 0])
    np.testing.assert_array_equal(enc[1], [0, 1, 0, 0])
    np.testing.assert_array_equal(enc[2], [0, 0, 1, 0])
    np.testing.assert_array_equal(enc[3], [0, 0, 0, 1])
    np.testing.assert_array_equal(enc[4], [0.25] * 4)


def test_encoding_roundtrip():
    codes = g.codes_from_str("ACGTNacgtn")
    np.testing.assert_array_equal(codes, [0, 1, 2, 3, 4, 0, 1, 2, 3, 4])
    enc = g.codes_to_encoding(codes)
    np.testing.assert_array_equal(g.encoding_to_codes(enc), codes)


def test_code_genome_retrieval_and_rc():
    gen = g.CodeGenome({"chr1": g.codes_from_str("ACGTACGTGG")})
    enc = gen.get_encoding_from_coords("chr1", 2, 6)
    np.testing.assert_array_equal(enc, g.sequence_to_encoding("GTAC"))
    # reverse complement of GTAC is GTAC
    rc = gen.get_encoding_from_coords("chr1", 2, 6, "-")
    np.testing.assert_array_equal(rc, g.sequence_to_encoding("GTAC"))
    rc2 = gen.get_encoding_from_coords("chr1", 6, 10, "-")
    np.testing.assert_array_equal(rc2, g.sequence_to_encoding("CCAC"))


def test_out_of_bounds_padding():
    gen = g.CodeGenome({"chr1": g.codes_from_str("ACGT")})
    enc = gen.get_encoding_from_coords("chr1", -2, 6)
    assert enc.shape == (8, 4)
    np.testing.assert_array_equal(enc[:2], np.full((2, 4), 0.25))
    np.testing.assert_array_equal(enc[-2:], np.full((2, 4), 0.25))


def test_memmap_genome_build_and_read(tmp_path):
    fasta = tmp_path / "toy.fa"
    fasta.write_text(">chrA\nACGTACGT\nGGCC\n>chrB\nTTTTAAAA\n")
    mm = g.MemmapGenome.build(str(fasta), str(tmp_path / "toy.mmap"))
    assert dict(mm.get_chr_lens()) == {"chrA": 12, "chrB": 8}
    np.testing.assert_array_equal(
        mm.get_encoding_from_coords("chrA", 0, 4),
        g.sequence_to_encoding("ACGT"),
    )
    np.testing.assert_array_equal(
        mm.get_encoding_from_coords("chrB", 4, 8),
        g.sequence_to_encoding("AAAA"),
    )
    # reopen from disk
    mm2 = g.MemmapGenome(str(tmp_path / "toy.mmap"))
    assert mm2.get_sequence_from_coords("chrA", 8, 12) == "GGCC"


def test_coord_round():
    assert coord_round(4001) == 4000
    assert coord_round(3999) == 0
    assert coord_round(8000) == 8000


def test_coord_clip_matches_reference():
    from conftest import import_reference_utils, reference_available

    if not reference_available():
        pytest.skip("reference unavailable")
    ref_clip = import_reference_utils().coord_clip

    rng = np.random.RandomState(0)
    for _ in range(200):
        chrlen = int(rng.randint(33_000_000, 250_000_000))
        pos = int(rng.randint(0, chrlen))
        assert coord_clip(pos, chrlen) == ref_clip(pos, chrlen), (pos, chrlen)
