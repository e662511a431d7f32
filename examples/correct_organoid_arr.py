"""In-memory motion correction (parity: reference examples/correct_organoid_arr.py).

Loads a recording into memory, corrects against an averaged reference with
``compensate_arr``, and reports quality statistics.

Run: python examples/correct_organoid_arr.py <input.h5|.tif|.mat>
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from flowreg3d_tpu.io.factory import get_video_file_reader
from flowreg3d_tpu.pipeline import OFOptions, compensate_arr, flow_statistics


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1

    reader = get_video_file_reader(sys.argv[1])
    video = reader[:]
    reader.close()
    print(f"Loaded {video.shape} ({video.dtype})")

    reference = video[: min(20, video.shape[0])].mean(axis=0)

    options = OFOptions(
        alpha=(1.5, 1.5, 1.5),
        quality_setting="balanced",
        min_level=-1,
        sigma=[[1.0, 1.0, 1.0, 0.1]],
        weight=[1.0] if video.shape[-1] == 1 else [0.5, 0.5],
        output_typename="single",
    )
    registered, flows = compensate_arr(video, reference, options=options)

    stats = flow_statistics(flows)
    print(f"mean displacement per frame: "
          f"{np.round(stats['mean_disp'], 3).tolist()}")
    err_before = np.abs(video.astype(np.float64) - reference).mean()
    err_after = np.abs(registered.astype(np.float64) - reference).mean()
    print(f"MAE vs reference: before {err_before:.5f} after {err_after:.5f} "
          f"({err_before / max(err_after, 1e-12):.2f}x improvement)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
