"""Level scheduling parity (reference: optical_flow_base_2d.cpp:36-59,
optical_flow_2d.cpp:188-189,267-272)."""

import numpy as np

from tpuflow.pyramid import level_schedule, max_warp_level


def test_max_warp_level_halving():
    # 32x32 at factor 0.5: 16, 8, 4 are >= 4; 2 breaks -> 4 levels.
    assert max_warp_level(32, 32, 0.5) == 4


def test_max_warp_level_breaks_on_either_dim():
    assert max_warp_level(32, 8, 0.5) == 2  # height hits 4 then 2


def test_schedule_sizes_and_spacing():
    specs = level_schedule(32, 32, 50, 0.5)
    assert [(s.width, s.height) for s in specs] == [(4, 4), (8, 8), (16, 16), (32, 32)]
    assert [s.level for s in specs] == [3, 2, 1, 0]
    assert specs[0].hx == 8.0 and specs[-1].hx == 1.0


def test_levels_count_caps_schedule():
    specs = level_schedule(32, 32, 2, 0.5)
    assert [s.level for s in specs] == [1, 0]
    assert specs[0].width == 16


def test_schedule_matches_reference_default_shape():
    # 584x388 at 0.9: sizes are ceil(dim * 0.9^k), strictly increasing in
    # the schedule, finishing at full res with hx = hy = 1.
    specs = level_schedule(584, 388, 50, 0.9)
    assert specs[-1].width == 584 and specs[-1].height == 388
    assert specs[0].width >= 4 and specs[0].height >= 4
    for a, b in zip(specs, specs[1:]):
        assert a.width <= b.width and a.height <= b.height
    for s in specs:
        scale = np.float32(0.9) ** np.float32(s.level)
        assert s.width == int(np.ceil(np.float32(584) * scale))
        assert s.height == int(np.ceil(np.float32(388) * scale))
