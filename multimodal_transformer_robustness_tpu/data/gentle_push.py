"""GentlePush ("mojupush"): 4-modality robot-pushing regression.

Port of reference src/dataset.py:257-592: read fannypack-format HDF5
trajectory files directly with h5py (each trajectory is a numbered group of
datasets), build gripper_pos [T,3] / gripper_sensors [T,7] / image [T,1024] /
controls [T,7] with the reference's hardcoded normalization constants, then
chop into overlapping 16-step subsequences at two half-offsets.  Labels are
the (x, y) object state per step (all_steps task, main.py:139-140).
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from .noise import add_timeseries_noise, add_visual_noise

_FILES = {"train": "gentle_push_1000.hdf5", "valid": "gentle_push_10.hdf5",
          "test": "gentle_push_300.hdf5"}

# normalization constants, verbatim from reference dataset.py:414-487
_GRIPPER_POS_MEAN = np.array([[0.46806443, -0.0017836, 0.88028437]], np.float32)
_GRIPPER_POS_STD = np.array([[0.02410769, 0.02341035, 0.04018243]], np.float32)
_GRIPPER_SENSORS_MEAN = np.array([[4.9182904e-01, 4.5039989e-02, -3.2791464e00,
                                   -3.3874984e-03, 1.1552566e-02,
                                   -8.4817986e-04, 2.1303751e-01]], np.float32)
_GRIPPER_SENSORS_STD = np.array([[1.6152629, 1.666905, 1.9186896, 0.14219016,
                                  0.14232528, 0.01675198, 0.40950698]], np.float32)
_STATES_MEAN = np.array([[0.4970164, -0.00916641]], np.float32)
_STATES_STD = np.array([[0.0572766, 0.06118315]], np.float32)
_CONTROLS_MEAN = np.array([[4.6594709e-01, -2.5247163e-03, 8.8094306e-01,
                            1.2939950e-04, -5.4364675e-05, -6.1112235e-04,
                            2.2041667e-01]], np.float32)
_CONTROLS_STD = np.array([[0.02239027, 0.02356066, 0.0405312, 0.00054858,
                           0.0005754, 0.00046352, 0.41451886]], np.float32)


def _read_trajectories_h5(path: str) -> List[dict]:
    """fannypack TrajectoriesFile layout: numbered top-level groups, one per
    trajectory, each a dict of datasets."""
    import h5py

    out = []
    with h5py.File(path, "r") as f:
        keys = sorted((k for k in f.keys()), key=lambda k: int(k))
        for k in keys:
            g = f[k]
            out.append({name: np.asarray(g[name]) for name in g.keys()})
    return out


class GentlePushDataset:
    def __init__(self, dataset_path: str, split_type: str = "train",
                 start_timestep: int = 0, visual_noise: float = 0,
                 prop_noise: float = 0, haptics_noise: float = 0,
                 controls_noise: float = 0, multimodal_noise: float = 0,
                 subsequence_length: int = 16, noise_range: int = 0):
        self.subsequence_length = subsequence_length
        self.start_timestep = start_timestep
        path = os.path.join(dataset_path, _FILES[split_type])

        self.trajectories = self._load(path, visual_noise, prop_noise,
                                       haptics_noise, controls_noise,
                                       multimodal_noise)
        # reference's optional noise-sweep replication of the test split
        # (dataset.py:287-315, disabled by default via noise_range=0)
        if split_type == "test" and noise_range:
            for kind in ("visual", "prop", "haptics", "controls", "multimodal"):
                for i in range(noise_range):
                    kw = {f"{kind}_noise": i / 10}
                    self.trajectories.extend(self._load(path, **{
                        "visual_noise": kw.get("visual_noise", 0),
                        "prop_noise": kw.get("prop_noise", 0),
                        "haptics_noise": kw.get("haptics_noise", 0),
                        "controls_noise": kw.get("controls_noise", 0),
                        "multimodal_noise": kw.get("multimodal_noise", 0)}))

        self.subsequences = self._split()
        # materialize per-modality arrays for fixed-shape batching
        self.inputs = [
            np.stack([s[0] for s in self.subsequences]).astype(np.float32),
            np.stack([s[1] for s in self.subsequences]).astype(np.float32),
            np.stack([s[2] for s in self.subsequences]).astype(np.float32),
            np.stack([s[3] for s in self.subsequences]).astype(np.float32),
        ]
        self.labels = np.stack([s[4] for s in self.subsequences]).astype(np.float32)
        self.n_modalities = 4

    def _load(self, path, visual_noise=0, prop_noise=0, haptics_noise=0,
              controls_noise=0, multimodal_noise=0):
        trajs = []
        for raw in _read_trajectories_h5(path):
            timesteps = len(raw["object-state"])
            states = raw["Cylinder0_pos"][:, :2].astype(np.float32).copy()

            gripper_pos = raw["eef_pos"].astype(np.float32).copy()
            if prop_noise != 0:
                gripper_pos = add_timeseries_noise(
                    [gripper_pos], noise_level=prop_noise, struct_drop=False)[0]
            assert gripper_pos.shape == (timesteps, 3)

            gripper_sensors = np.concatenate(
                (raw["force"], raw["contact"][:, np.newaxis]), axis=1
            ).astype(np.float32)
            if haptics_noise != 0:
                gripper_sensors = add_timeseries_noise(
                    [gripper_sensors], noise_level=haptics_noise,
                    struct_drop=False)[0]
            assert gripper_sensors.shape[1] == 7

            image = raw["image"].copy()
            if visual_noise != 0:
                image = np.array(add_visual_noise(image, noise_level=visual_noise))
            image = image.reshape(timesteps, -1).astype(np.float32)
            assert image.shape == (timesteps, 32 * 32)

            eef = raw["eef_pos"]
            eef_shifted = np.roll(eef, shift=1, axis=0)
            eef_shifted[0] = eef[0]
            controls = np.concatenate(
                [eef_shifted, eef - eef_shifted, raw["contact"][:, np.newaxis]],
                axis=1).astype(np.float32)
            if controls_noise != 0:
                controls = add_timeseries_noise(
                    [controls], noise_level=controls_noise, struct_drop=False)[0]
            if multimodal_noise != 0:
                tmp = add_timeseries_noise(
                    [image, gripper_pos, gripper_sensors, controls],
                    noise_level=multimodal_noise, rand_drop=False)
                image, gripper_pos, gripper_sensors, controls = tmp

            gripper_pos = (gripper_pos - _GRIPPER_POS_MEAN) / _GRIPPER_POS_STD
            gripper_sensors = (gripper_sensors - _GRIPPER_SENSORS_MEAN) / _GRIPPER_SENSORS_STD
            states = (states - _STATES_MEAN) / _STATES_STD
            controls = (controls - _CONTROLS_MEAN) / _CONTROLS_STD

            s = self.start_timestep
            trajs.append((states[s:], gripper_pos[s:], gripper_sensors[s:],
                          image[s:], controls[s:]))
        return trajs

    def _split(self):
        """Overlapping subsequences at offsets (0, L//2) — dataset.py:501-566."""
        L = self.subsequence_length
        out = []
        for states, gripper_pos, gripper_sensors, image, controls in self.trajectories:
            for offset in (0, L // 2):
                def split_fn(x):
                    x = x[offset:]
                    sections = len(x) // L
                    return np.split(x[: sections * L], sections) if sections else []

                for s, gp, gs, im, c in zip(
                        split_fn(states), split_fn(gripper_pos),
                        split_fn(gripper_sensors), split_fn(image),
                        split_fn(controls)):
                    out.append([gp, gs, im, c, s])
        return out

    # ---- info surface ----
    def get_n_modalities(self) -> int:
        return 4

    def get_seq_len(self) -> int:
        return self.subsequence_length

    def get_dim(self) -> List[int]:
        return [self.inputs[0].shape[-1], self.inputs[1].shape[-1],
                self.inputs[2].shape[-1], self.inputs[3].shape[-1]]

    def __len__(self) -> int:
        return len(self.labels)
