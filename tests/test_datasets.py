"""Dataset loaders against synthetic files in the real on-disk formats."""

import os

import numpy as np
import pytest

from multimodal_transformer_robustness_tpu.data import BatchIterator, get_data


def test_avmnist_from_files(tmp_path):
    rng = np.random.default_rng(0)
    os.makedirs(tmp_path / "image")
    os.makedirs(tmp_path / "audio")
    np.save(tmp_path / "image" / "test_data.npy",
            rng.standard_normal((20, 784)).astype(np.float32))
    np.save(tmp_path / "audio" / "test_data.npy",
            (rng.random((20, 112, 112)) * 255).astype(np.float32))
    np.save(tmp_path / "test_labels.npy", rng.integers(0, 10, 20))
    ds = get_data("avmnist", str(tmp_path), "test")
    assert len(ds) == 20
    assert ds.get_dim() == [28, 112]
    assert ds.inputs[0].shape == (20, 1, 28, 28)
    assert float(ds.inputs[1].max()) <= 1.0  # audio / 255
    b = next(iter(BatchIterator(ds, 8)))
    assert b.inputs[0].shape == (8, 1, 28, 28)


def test_gentle_push_from_h5(tmp_path):
    h5py = pytest.importorskip("h5py")
    rng = np.random.default_rng(0)
    path = tmp_path / "gentle_push_10.hdf5"
    with h5py.File(path, "w") as f:
        for k in range(2):
            g = f.create_group(str(k))
            T = 40
            g["object-state"] = rng.standard_normal((T, 5)).astype(np.float32)
            g["Cylinder0_pos"] = rng.standard_normal((T, 3)).astype(np.float32)
            g["eef_pos"] = rng.standard_normal((T, 3)).astype(np.float32)
            g["force"] = rng.standard_normal((T, 6)).astype(np.float32)
            g["contact"] = rng.random(T).astype(np.float32)
            g["image"] = rng.random((T, 32, 32)).astype(np.float32)
    ds = get_data("mojupush", str(tmp_path), "valid")
    # 2 trajectories x (2 subseq at offset 0 + 1..2 at offset 8), 16 steps
    assert len(ds) > 0
    assert ds.get_seq_len() == 16
    assert ds.get_dim() == [3, 7, 1024, 7]
    assert ds.labels.shape[1:] == (16, 2)
    b = next(iter(BatchIterator(ds, 4)))
    assert b.inputs[2].shape == (4, 16, 1024)


def test_enrico_from_files(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    os.makedirs(tmp_path / "screenshots")
    os.makedirs(tmp_path / "wireframes")
    rows = ["screen_id,topic"]
    for i in range(12):
        sid = str(10000 + i)
        rows.append(f"{sid},topic{i % 3}")
        for d in ("screenshots", "wireframes"):
            Image.fromarray(
                (rng.random((64, 32, 3)) * 255).astype(np.uint8)
            ).save(tmp_path / d / f"{sid}.jpg")
    (tmp_path / "design_topics.csv").write_text("\n".join(rows) + "\n")
    ds = get_data("enrico", str(tmp_path), "train")
    assert len(ds) == int(12 * 0.8)
    assert ds.get_seq_len() == 128
    assert ds.get_dim() == [768, 768]
    assert ds.inputs[0].shape == (9, 128, 768)


def test_eeg2a_from_mat(tmp_path):
    import scipy.io as sio

    rng = np.random.default_rng(0)
    mat = {f"data{i+1}": rng.standard_normal((6, 5, 4)).astype(np.float32)
           for i in range(4)}
    sio.savemat(tmp_path / "A01T.mat", mat)
    ds = get_data("eeg2a", str(tmp_path), "train", train_ratio=0.75,
                  file_num_range_train=["A01T.mat"])
    assert len(ds) == 12  # 16 samples * 0.75
    assert ds.get_dim() == [5]
    assert ds.get_seq_len() == 6
    ds_v = get_data("eeg2a", str(tmp_path), "valid", train_ratio=0.75,
                    file_num_range_train=["A01T.mat"])
    assert len(ds_v) == 4


def test_noise_injectors():
    from multimodal_transformer_robustness_tpu.data.noise import (
        add_timeseries_noise,
        add_visual_noise,
    )

    rng = np.random.default_rng(0)
    x = [rng.standard_normal((10, 4)).astype(np.float32).copy()]
    out = add_timeseries_noise(x, noise_level=0.5, rng=rng)
    assert out[0].shape == (10, 4)
    imgs = [(rng.random((16, 16)) * 255).astype(np.uint8) for _ in range(2)]
    noisy = add_visual_noise(imgs, noise_level=1.0, rng=rng)
    assert len(noisy) == 2 and noisy[0].shape == (16, 16)
    # zero noise level leaves visual data untouched
    clean = add_visual_noise(imgs, noise_level=0.0, rng=rng)
    np.testing.assert_array_equal(clean[0], imgs[0])


def test_periodic_noise_injector():
    """Rebuilt periodic injector (reference data_utils.py:271-282 intended
    semantics; the reference's own copy is unrunnable — PARITY.md)."""
    from PIL import Image

    from multimodal_transformer_robustness_tpu.data.noise import (
        periodic, synth_periodic_patterns)

    pats = synth_periodic_patterns(size=64)
    assert len(pats) == 6
    for p in pats:
        assert p.shape == (64, 64, 4) and p.dtype == np.uint8
        # genuinely periodic: each grating uses its full dynamic range
        assert p[..., 0].min() <= 5 and p[..., 0].max() >= 250
    # deterministic stand-ins for the fixed PNG assets
    np.testing.assert_array_equal(pats[0], synth_periodic_patterns(64)[0])

    rng = np.random.default_rng(0)
    img = Image.fromarray((np.random.default_rng(1).random((20, 24, 3))
                           * 255).astype(np.uint8))
    out = periodic(img, rng=rng)
    assert len(out) == 6
    for v in out:
        assert v.size == img.size and v.mode == "RGBA"
    # blend actually corrupts (alpha 0.3 over a non-constant grating)
    assert not np.array_equal(np.array(out[0].convert("RGB")), np.array(img))
    # seeded reproducibility
    again = periodic(img, rng=np.random.default_rng(0))
    np.testing.assert_array_equal(np.array(out[3]), np.array(again[3]))


def test_multibench_pickle_loader(tmp_path):
    import pickle

    rng = np.random.default_rng(0)

    def split(n, t=12):
        return {"vision": rng.standard_normal((n, t, 20)),
                "audio": rng.standard_normal((n, t, 5)),
                "text": rng.standard_normal((n, t, 300)),
                "labels": rng.standard_normal((n, 1))}

    data = {"train": split(10), "dev": split(4), "test": split(4)}
    # inject NaNs like MultiBench covarep tracks
    data["train"]["audio"][0, 0, 0] = np.nan
    with open(tmp_path / "urfunny.pkl", "wb") as f:
        pickle.dump(data, f)

    ds = get_data("urfunny", str(tmp_path), "train")
    assert len(ds) == 10
    assert ds.get_dim() == [300, 5, 20]  # (text, audio, vision) order
    assert np.isfinite(ds.inputs[1]).all()  # NaNs zeroed
    assert ds.labels.dtype == np.int64  # binarized for humor detection
    ds_v = get_data("mosi", str(tmp_path), "valid")  # 'dev' alias
    assert len(ds_v) == 4
    assert ds_v.labels.dtype == np.float32  # regression labels kept
