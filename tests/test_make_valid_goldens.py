"""make_valid goldens ported from the reference
(tests/test_geometry.py:184-381): bow-tie split, self-intersection
hole extraction, pinch-vertex hole with dissolved zero-width corridor,
and the MultiPolygon type-promotion rule.  Comparison normalizes ring
rotation + orientation (the reference comparator does the same via
shapely normalize/equals).

Known limitation vs GEOS (documented): overlapping parts of an input
MultiPolygon are not unioned into disjoint polygons (the reference's
6-polygon explosion case, :385-470) — each part is repaired
independently.
"""

import numpy as np
import pytest

from gdal_boots_ray.kernels.geometry import make_valid


def norm(g):
    def nring(r):
        pts = [tuple(np.round(p, 6)) for p in r[:-1]]
        best = None
        for seq in (pts, pts[::-1]):
            m = seq.index(min(seq))
            c = tuple(seq[m:] + seq[:m])
            best = c if best is None or c < best else best
        return best

    polys = [g["coordinates"]] if g["type"] == "Polygon" else g["coordinates"]
    return g["type"], sorted(sorted(nring(rg) for rg in p) for p in polys)


RING3 = [
    [123.912279, -9.94963], [124.808856, -9.945983], [124.658416, -10.631109],
    [124.419945, -10.627865], [124.417387, -10.633294], [124.384578, -10.780016],
    [124.378588, -10.807525], [124.380593, -10.810794], [124.598579, -10.901209],
    [124.590119, -10.939784], [123.915179, -10.942552], [123.912279, -9.94963],
    [124.16208, -10.716425], [124.195546, -10.570105], [123.983748, -10.516936],
    [123.94459, -10.689683], [123.959686, -10.6948], [124.149828, -10.743025],
    [124.155046, -10.743006], [124.16208, -10.716425], [123.912279, -9.94963],
]

EXP3 = {
    "type": "Polygon",
    "coordinates": [
        [
            [123.912279, -9.94963], [124.808856, -9.945983], [124.658416, -10.631109],
            [124.419945, -10.627865], [124.417387, -10.633294], [124.384578, -10.780016],
            [124.378588, -10.807525], [124.380593, -10.810794], [124.598579, -10.901209],
            [124.590119, -10.939784], [123.915179, -10.942552], [123.912279, -9.94963],
        ],
        [
            [124.107187, -10.547924], [123.983748, -10.516936], [123.94459, -10.689683],
            [123.959686, -10.6948], [124.149828, -10.743025], [124.155046, -10.743006],
            [124.16208, -10.716425], [124.195546, -10.570105], [124.107187, -10.547924],
        ],
    ],
}


def test_bowtie_golden():
    g = make_valid(
        {
            "type": "Polygon",
            "coordinates": [
                [
                    [28.377685, 53.533778], [28.388671, 54.278054], [26.768188, 53.504384],
                    [26.845092, 54.226707], [28.377685, 53.533778],
                ]
            ],
        }
    )
    exp = {
        "type": "MultiPolygon",
        "coordinates": [
            [[[27.582652, 53.893235], [26.768188, 53.504384], [26.845092, 54.226707], [27.582652, 53.893235]]],
            [[[27.582652, 53.893235], [28.388671, 54.278054], [28.377685, 53.533778], [27.582652, 53.893235]]],
        ],
    }
    assert norm(g) == norm(exp)


def test_hole_extraction_golden():
    g = make_valid(
        {
            "type": "Polygon",
            "coordinates": [
                [
                    [26.531982, 54.204223], [26.740722, 53.855766], [28.168945, 53.448806],
                    [28.372192, 54.007768], [26.779174, 53.402982], [28.883056, 53.176411],
                    [28.943481, 54.188155], [26.531982, 54.204223],
                ]
            ],
        }
    )
    exp = {
        "type": "Polygon",
        "coordinates": [
            [
                [27.443987, 53.655377], [26.740722, 53.855766], [26.531982, 54.204223],
                [28.943481, 54.188155], [28.883056, 53.176411], [26.779174, 53.402982],
                [27.443987, 53.655377],
            ],
            [[27.443987, 53.655377], [28.168945, 53.448806], [28.372192, 54.007768], [27.443987, 53.655377]],
        ],
    }
    assert norm(g) == norm(exp)


def test_pinch_hole_dissolve_golden():
    g = make_valid({"type": "Polygon", "coordinates": [RING3]})
    assert norm(g) == norm(EXP3)


def test_multipolygon_promotion_golden():
    g = make_valid({"type": "MultiPolygon", "coordinates": [[RING3]]})
    assert norm(g) == norm({"type": "MultiPolygon", "coordinates": [EXP3["coordinates"]]})
