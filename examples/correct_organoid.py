"""File-based motion correction of a volumetric recording.

Parity target: reference examples/correct_organoid.py — the canonical
``OFOptions`` + ``compensate_recording`` usage (file in, file out, reference
from frame indices, displacement saving). Napari visualization is optional.

Run: python examples/correct_organoid.py <input.h5|.tif|.mat> [output_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flowreg3d_tpu.pipeline import (
    OFOptions,
    RegistrationConfig,
    compensate_recording,
)


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    input_file = sys.argv[1]
    output_path = Path(sys.argv[2] if len(sys.argv) > 2 else "results")

    options = OFOptions(
        input_file=input_file,
        output_path=output_path,
        output_format="HDF5",
        alpha=(1.5, 1.5, 1.5),
        quality_setting="balanced",
        min_level=-1,
        sigma=[[1.0, 1.0, 1.0, 0.1]],
        weight=[1.0],
        reference_frames=list(range(0, 20)),
        save_w=True,
        save_meta_info=True,
    )
    config = RegistrationConfig(verbose=True)
    compensate_recording(options, config=config)
    print(f"Compensated recording written to {output_path}")

    try:
        import napari  # noqa: F401

        _view(output_path)
    except ImportError:
        pass
    return 0


def _view(output_path):
    import napari

    from flowreg3d_tpu.io.factory import get_video_file_reader

    reader = get_video_file_reader(str(Path(output_path) / "compensated.HDF5"))
    viewer = napari.Viewer()
    viewer.add_image(reader[:], name="compensated")
    napari.run()


if __name__ == "__main__":
    sys.exit(main())
