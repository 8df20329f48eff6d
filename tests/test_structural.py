"""SV algebra tests: operations, round-trips, and parity with the reference
StructuralChange2 where its semantics are correct."""

import numpy as np
import pytest

from orca_tpu.predict.structural import Segment, StructuralChange


def seq_of(sc, genome_str):
    """Materialize the mutated chromosome as a string given the reference
    chromosome string (strand '-' => reverse complement)."""
    comp = str.maketrans("ACGTN", "TGCAN")
    out = []
    for seg in sc.segments:
        s = genome_str[seg.start : seg.end]
        if seg.strand == "-":
            s = s.translate(comp)[::-1]
        out.append(s)
    return "".join(out)


GENOME = "ACGTACGTGGCCATATCGCGAATT"  # 24 bp toy chromosome


def test_duplicate():
    sc = StructuralChange("chrT", 24)
    sc.duplicate(4, 8)
    assert sc.length == 28
    assert seq_of(sc, GENOME) == GENOME[:8] + GENOME[4:8] + GENOME[8:]


def test_delete():
    sc = StructuralChange("chrT", 24)
    sc.delete(4, 8)
    assert sc.length == 20
    assert seq_of(sc, GENOME) == GENOME[:4] + GENOME[8:]


def test_invert_roundtrip():
    sc = StructuralChange("chrT", 24)
    sc.invert(4, 12)
    comp = str.maketrans("ACGTN", "TGCAN")
    expected = GENOME[:4] + GENOME[4:12].translate(comp)[::-1] + GENOME[12:]
    assert seq_of(sc, GENOME) == expected
    # proper inversion round-trips (the reference quirk at orca_utils.py:870
    # would leave strand '-')
    sc.invert(4, 12)
    assert seq_of(sc, GENOME) == GENOME


def test_insert():
    sc = StructuralChange("chrT", 24)
    sc.insert(4, 6, name="insX")
    assert sc.length == 30
    assert sc.segments[1].chrom == "insX"
    segs = sc[0:30]
    assert [s.length for s in segs] == [4, 6, 20]


def test_concat():
    a = StructuralChange("chrA", 10)
    b = StructuralChange("chrB", 14)
    c = a + b
    assert c.length == 24
    assert [s.chrom for s in c.segments] == ["chrA", "chrB"]


def test_query_slicing():
    sc = StructuralChange("chrT", 24)
    sc.duplicate(4, 8)
    segs = sc[2:14]
    assert sum(s.length for s in segs) == 12
    # segment composition: [2,4) + [4,8) + dup[4,8) + [8,10)
    assert [(s.start, s.end) for s in segs] == [(2, 4), (4, 8), (4, 8), (8, 10)]


def test_query_ref():
    sc = StructuralChange("chrT", 24)
    sc.duplicate(4, 8)
    ref, cur = sc.query_ref("chrT", 5, 7)
    assert len(cur) == 2  # appears twice after duplication
    assert cur[0][2] == "+" and cur[1][2] == "+"
    assert cur[0][0] == 5 and cur[1][0] == 9


def test_complex_composition():
    # del + inv + dup chained, verify via string materialization
    sc = StructuralChange("chrT", 24)
    sc.delete(0, 2)
    sc.invert(2, 6)
    sc.duplicate(10, 14)
    comp = str.maketrans("ACGTN", "TGCAN")
    manual = GENOME[2:]
    manual = manual[:2] + manual[2:6].translate(comp)[::-1] + manual[6:]
    manual = manual[:14] + manual[10:14] + manual[14:]
    assert seq_of(sc, GENOME) == manual


def test_out_of_bounds_query_raises():
    sc = StructuralChange("chrT", 24)
    with pytest.raises(ValueError):
        sc.query(0, 25)


@pytest.mark.parametrize("op", ["duplicate", "delete", "invert"])
def test_matches_reference_structural_change(op):
    from conftest import import_reference_utils, reference_available

    if not reference_available():
        pytest.skip("reference unavailable")
    StructuralChange2 = import_reference_utils().StructuralChange2

    ref = StructuralChange2("chrT", 24)
    ours = StructuralChange("chrT", 24)
    getattr(ref, op)(4, 12)
    getattr(ours, op)(4, 12)
    ref_segs = ref[0 : ref.coord_points[-1]]
    our_segs = ours[0 : ours.length]
    assert len(ref_segs) == len(our_segs)
    for r, o in zip(ref_segs, our_segs):
        assert (r.chr, r.start, r.end, r.strand) == (
            o.chrom, o.start, o.end, o.strand,
        )
