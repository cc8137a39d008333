#!/usr/bin/env python
"""Example: dense optical flow on the reference's bundled rub pair.

Usage:
    python examples/rub_pair.py [data_dir] [out_dir]

Reads rub1.raw / rub2.raw (584x388 u8 X-ray frames), runs the default
coarse-to-fine solve, and writes the reference-format outputs plus a VTK
file for ParaView.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpuflow import FlowConfig, compute_flow
from tpuflow.io import (
    read_raw_u8,
    write_flow_image_rgb,
    write_magnitude_f32,
    write_raw_f32,
)
from tpuflow.io.vtk import write_flow_vtk


def main():
    data_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/data"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "./out"
    os.makedirs(out_dir, exist_ok=True)

    f0 = read_raw_u8(os.path.join(data_dir, "rub1.raw"), 584, 388)
    f1 = read_raw_u8(os.path.join(data_dir, "rub2.raw"), 584, 388)

    result = compute_flow(f0, f1, FlowConfig())
    print(f"solved in {result.seconds:.3f}s "
          f"({result.megapixels_per_second:.2f} Mpix/s steady-state)")
    print(f"flow range u [{result.u.min():.2f}, {result.u.max():.2f}] "
          f"v [{result.v.min():.2f}, {result.v.max():.2f}] "
          f"mean |f| {np.hypot(result.u, result.v).mean():.3f}")

    write_raw_f32(os.path.join(out_dir, "flow-u-584-388.raw"), result.u)
    write_raw_f32(os.path.join(out_dir, "flow-v-584-388.raw"), result.v)
    write_flow_image_rgb(result.u, result.v, 10, os.path.join(out_dir, "res.ppm"))
    write_magnitude_f32(result.u, result.v, os.path.join(out_dir, "amp-584-388.raw"))
    write_flow_vtk(result.u, result.v, os.path.join(out_dir, "flow.vtk"))
    print(f"outputs in {out_dir}")


if __name__ == "__main__":
    main()
