"""Standard CMU-MOSEI fold video-ID lists (2249 train / 300 valid / 678 test).

The reference hardcodes them in data_prep/std_folder.py; they are dataset
metadata published with the CMU MultimodalSDK.  We resolve them at runtime,
in priority order:
  1. a JSON file {"train": [...], "valid": [...], "test": [...]} passed via
     ``--folds``/the ``folds_json`` argument;
  2. the CMU MultimodalSDK (``mmsdk.mmdatasdk.cmu_mosei.standard_folds``) if
     installed;
  3. the reference checkout's ``data_prep/std_folder.py`` if present on disk
     (loaded as data, not imported into our package).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

REFERENCE_STD_FOLDER = "/root/reference/data_prep/std_folder.py"


def load_folds(folds_json: Optional[str] = None,
               reference_path: str = REFERENCE_STD_FOLDER) -> Dict[str, List[str]]:
    if folds_json:
        with open(folds_json) as f:
            folds = json.load(f)
        assert set(folds) >= {"train", "valid", "test"}
        return folds
    try:
        from mmsdk.mmdatasdk.dataset.standard_datasets.CMU_MOSEI import (
            cmu_mosei_std_folds as sf)

        return {"train": list(sf.standard_train_fold),
                "valid": list(sf.standard_valid_fold),
                "test": list(sf.standard_test_fold)}
    except Exception:
        pass
    if os.path.exists(reference_path):
        ns: dict = {}
        with open(reference_path) as f:
            exec(compile(f.read(), reference_path, "exec"), ns)  # data tables
        return {"train": list(ns["standard_train_fold"]),
                "valid": list(ns["standard_valid_fold"]),
                "test": list(ns["standard_test_fold"])}
    raise FileNotFoundError(
        "no MOSEI fold source found: pass folds_json, install mmsdk, or "
        "provide the reference std_folder.py path")
