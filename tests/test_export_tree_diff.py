"""Semantics of the byte-level export-tree differential
(tools/refdiff/tablediff.diff_export_trees, r13).

The pass must flag what json_options make observable — int-vs-float
typing, indent/minify/spacing, \\u escaping — while tolerating object
KEY ORDER (the reference itself is key-order nondeterministic: set
iteration under a randomized hash salt) and comparing .gz files on
decompressed text.
"""

import gzip
import os

from tools.refdiff.tablediff import diff_export_trees


def _write(root, rel, text):
    p = os.path.join(root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    if rel.endswith(".gz"):
        with gzip.open(p, "wt", encoding="utf-8") as fh:
            fh.write(text)
    else:
        with open(p, "w", encoding="utf-8") as fh:
            fh.write(text)


def _diff(tmp_path, ref_text, spark_text, rel="api/x.json"):
    ra, rb = str(tmp_path / "ref"), str(tmp_path / "spark")
    _write(ra, rel, ref_text)
    _write(rb, rel, spark_text)
    return diff_export_trees(ra, rb)


def test_key_order_only_is_tolerated(tmp_path):
    assert _diff(tmp_path, '{"a": 1, "b": 2}', '{"b": 2, "a": 1}') == []


def test_int_float_typing_is_flagged(tmp_path):
    out = _diff(tmp_path, '{"bins": [10, 20]}', '{"bins": [10.0, 20.0]}')
    assert out and "typing" in out[0]


def test_formatting_divergence_is_flagged(tmp_path):
    out = _diff(tmp_path, '{"a": 1}', '{"a":1}')
    assert out and "formatting" in out[0]
    out2 = _diff(tmp_path, '{\n  "a": 1\n}', '{\n    "a": 1\n}')
    assert out2 and "formatting" in out2[0]


def test_ensure_ascii_divergence_is_flagged(tmp_path):
    out = _diff(tmp_path, '{"a": "f\\u00eat"}', '{"a": "fêt"}')
    assert out and "formatting" in out[0]


def test_gz_compared_decompressed(tmp_path):
    rel = "api/x.json.gz"
    assert _diff(tmp_path, '{"a": 1}', '{"a": 1}', rel) == []
    out = _diff(tmp_path, '{"a": 1}', '{"a": 2}', rel)
    assert out


def test_content_difference_still_reported(tmp_path):
    out = _diff(tmp_path, '{"a": 1}', '{"a": 3}')
    assert out
