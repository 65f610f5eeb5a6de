"""Golden regression test: the full pipeline's data lines (and ``#@``
metadata) on a frozen dataset must match tests/golden/ exactly.

Regenerate deliberately with:  python tests/make_golden.py
"""

import os

import pytest

import make_golden


@pytest.mark.skipif(not os.path.isdir(make_golden.GOLDEN),
                    reason="golden fixtures not generated")
def test_pipeline_matches_golden(tmp_path):
    make_golden.generate(str(tmp_path))
    mismatches = []
    for name in make_golden.FILES:
        got = make_golden.strip_volatile(str(tmp_path / name))
        want = open(os.path.join(make_golden.GOLDEN, name)).read()
        if got != want:
            mismatches.append(name)
    assert not mismatches, f"golden mismatch in: {mismatches}"
