"""Config/result caching helpers (reference speech_distillation/yaml_utils.py).

`do_and_cache` makes generated module configs reproducible across runs: the
first run writes the YAML, later runs load it verbatim (and `copy_path`
supports the experiment copy-from semantics, lightning_model.py:775-799).
`do_with_pickle_cache` is the dataset-side pickle variant
(multilabel_wave_dataset.py:144-170).
"""

from __future__ import annotations

import pickle
from pathlib import Path

import yaml


def do_and_cache(func, cache_path, copy_path=None):
    read_path = Path(cache_path if copy_path is None else copy_path)
    write_path = Path(cache_path)
    if read_path.exists():
        with open(read_path, "r") as cache:
            result = yaml.load(cache, yaml.FullLoader)
    else:
        result = func()
    write_path.parent.mkdir(parents=True, exist_ok=True)
    with open(write_path, "w") as cache:
        yaml.dump(result, cache)
    return result


def do_and_cache_dict(func, cache_format):
    result = func()
    output = {}
    for key, value in result.items():
        cache_path = Path(cache_format.format(key))
        if cache_path.exists():
            with open(cache_path, "r") as cache:
                output[key] = yaml.load(cache, yaml.FullLoader)
        else:
            cache_path.parent.mkdir(parents=True, exist_ok=True)
            with open(cache_path, "w") as cache:
                output[key] = value
                yaml.dump(value, cache)
    return output


def do_with_pickle_cache(func, pickle_path):
    pickle_path = Path(pickle_path)
    if pickle_path.exists():
        with open(pickle_path, "rb") as f:
            return pickle.load(f)
    pickle_path.parent.mkdir(parents=True, exist_ok=True)
    result = func()
    with open(pickle_path, "wb") as f:
        pickle.dump(result, f)
    return result


def create_pickle_cache(func, pickle_path):
    pickle_path = Path(pickle_path)
    if not pickle_path.exists():
        pickle_path.parent.mkdir(parents=True, exist_ok=True)
        with open(pickle_path, "wb") as f:
            pickle.dump(func(), f)
