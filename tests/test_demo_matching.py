"""CI smoke test for the matching demo on the REAL example pairs.

The reference ships three D2Net image pairs
(/root/reference/examples/images/pair_{1,2,3}) that its (missing
upstream) visualize_matches notebook demos on — this drives
``examples/demo_matching.py`` end-to-end on them: real jpg decode,
flexible resize, the full fine-matching pipeline, and the match
visualisation writer. Natural images exercise statistics the seeded
fixtures cannot (sky, repeated facades, low texture).
"""

from __future__ import annotations

import os

import pytest

PAIRS = "/root/reference/examples/images"


@pytest.mark.slow
def test_demo_matching_real_pairs(tmp_path):
    if not os.path.isdir(PAIRS):
        pytest.skip("reference example images unavailable")
    from examples.demo_matching import main

    main([
        "--pairs", PAIRS, "--out", str(tmp_path), "--imsize", "256",
    ])
    pngs = sorted(p for p in os.listdir(tmp_path) if p.endswith(".png"))
    assert pngs == ["pair_1.png", "pair_2.png", "pair_3.png"]
    for p in pngs:
        assert os.path.getsize(os.path.join(tmp_path, p)) > 10_000
