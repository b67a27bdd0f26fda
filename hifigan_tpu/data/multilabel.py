"""Multi-label waveform dataset (host-side engine feeding the distill trainer).

Capability parity with reference
speech_distillation/multilabel_wave_dataset.py — yields
``(wav, wav_path, time_labels, grouped_labels)`` with:

- declarative corpus assembly via data configs (complex_parser), pickle-
  cached (files_with_labels.pickle)
- label taxonomy: content = speaker/sex/phones/sad, style = mic-brand +
  7 augmentation labels (ref :33-40)
- per-utterance label tensors segmented on the embedding grid from
  TextGrid alignments; SAD (speech-activity) derived from word alignments
  (ref :313-325); pickle label cache per item
- class-frequency -> loss-weight computation incl. augmentation priors
  (ref :83-129, :172-219)
- corrupt-row quarantine (rows_to_remove.pickle, ref :73-79,:178-186)
- golden-ratio subsampling for deterministic validation subsets (ref :257)
- random cropping aligned to the embedding grid (ref :432-476)
- probability-tree augmentation application (ref :478-517)
- ``disable_wavs`` fake mode (zero waveforms; label/classifier paths only)

numpy end to end (the TPU consumes stacked host batches; no torch).
"""

from __future__ import annotations

import json
import math
import os
import random
from collections import OrderedDict
from pathlib import Path

import numpy as np
import pandas as pd

from hifigan_tpu.audio.io import load_wav
from hifigan_tpu.data.augmentation import (
    CodecAugmentor,
    HighpassAugmentor,
    HilbertAugmentor,
    LowpassAugmentor,
    NoiseAugmentor,
    ReverbAugmentor,
    RirAugmentor,
)
from hifigan_tpu.data.complex_parser import get_path_by_glob, parse_complex_data
from hifigan_tpu.data.textgrid import parse_textgrid
from hifigan_tpu.utils.caching import create_pickle_cache, do_with_pickle_cache

PHI = (1 + math.sqrt(5)) / 2

labels_to_use = ["speaker", "sex", "mic-brand"]
sad_based_labels = ["sex", "speaker"]
timed_labels_to_use = ["phones", "sex", "speaker", "sad"]

label_groups = {
    "content": ["speaker", "sex", "phones", "sad"],
    "style": ["mic-brand"],
}
augmentation_label_groups = {
    "content": [],
    "style": ["noise", "rir", "lowpass", "highpass", "reverb", "codec", "hilbert"],
}


class MultilabelWaveDataset:
    def __init__(self, data_dir, aug_dir, cache_dir, name, source, segment_length,
                 sampling_rate, embedding_size, augmentation_config=None,
                 disable_wavs=False, split=True, size=None, fine_tuning=False,
                 deterministic=False, num_workers: int | None = None):
        self.data_dir = data_dir
        self.aug_dir = aug_dir
        self.cache_dir = cache_dir
        self.name = name
        self.source = source
        self.segment_length = segment_length
        self.embedding_size = embedding_size
        self.sampling_rate = sampling_rate
        self.split = split
        self.fine_tuning = fine_tuning
        self.size = size
        self.deterministic = deterministic
        self.disable_wavs = disable_wavs
        self.num_workers = num_workers
        self.should_augment = augmentation_config is not None
        if self.should_augment:
            self.aug_options = augmentation_config["options"]
            self.aug_probs = augmentation_config["probs"]

        print(f"Creating [{self.name}] dataset:")
        Path(cache_dir, source, "labels_cache").mkdir(parents=True, exist_ok=True)
        config_path = f"**/data_configs/{source}/*.json"

        rows_to_remove_path = os.path.join(cache_dir, source, "rows_to_remove.pickle")
        rows_to_remove = do_with_pickle_cache(lambda: [], rows_to_remove_path)

        self.files_with_labels = do_with_pickle_cache(
            lambda: self.get_files_with_labels(self.data_dir, config_path),
            os.path.join(cache_dir, source, "files_with_labels.pickle"),
        )
        self.remove_rows_from_files_with_labels(rows_to_remove)
        if self.size is None:
            self.size = len(self.files_with_labels)

        self.label_options_weights = do_with_pickle_cache(
            self.get_all_label_options_weights,
            os.path.join(cache_dir, source, "label_options_weights.pickle"),
        )

        # augmentation label priors from the probability tree (ref :86-99)
        if self.should_augment:
            base_prob = self.aug_probs["prob"]
            sub_probs = self.aug_probs["sub_probs"]
            for augmentation, augmentation_labels in self.aug_options.items():
                sub_prob = sub_probs[augmentation]["prob"]
                option_prob = 1.0 / len(augmentation_labels)
                true_w = {
                    "none": 0.0,
                    "disabled": (1 - base_prob) + base_prob * (1 - sub_prob),
                    **{label: base_prob * sub_prob * option_prob for label in augmentation_labels},
                }
                false_w = {k: 1 - v for k, v in true_w.items()}
                self.label_options_weights[augmentation] = {"true": true_w, "false": false_w}

        all_label_groups = {
            key: [*label_groups[key], *augmentation_label_groups[key]] for key in label_groups
        }
        self.label_options_weights_groups = {
            key: {label: self.label_options_weights[label] for label in group if label in self.label_options_weights}
            for key, group in all_label_groups.items()
        }
        self.label_options_groups = {
            key: {label: tuple(value["true"].keys()) for label, value in group.items()}
            for key, group in self.label_options_weights_groups.items()
        }
        self.label_options = {
            key: tuple(v["true"].keys()) for key, v in self.label_options_weights.items()
        }
        self.label_weights_groups = {
            key: {
                label: {
                    "true": tuple(self.label_options_weights_groups[key][label]["true"][o] for o in options),
                    "false": tuple(self.label_options_weights_groups[key][label]["false"][o] for o in options),
                }
                for label, options in group.items()
            }
            for key, group in self.label_options_groups.items()
        }
        self.label_weights = {
            label: {
                "true": tuple(self.label_options_weights[label]["true"][o] for o in options),
                "false": tuple(self.label_options_weights[label]["false"][o] for o in options),
            }
            for label, options in self.label_options.items()
        }

        if self.should_augment:
            self.aug_methods = {
                "noise": NoiseAugmentor(self.aug_dir, self.label_options).augment,
                "rir": RirAugmentor(self.aug_dir).augment,
                "reverb": ReverbAugmentor(self.sampling_rate).augment,
                "lowpass": LowpassAugmentor(self.sampling_rate).augment,
                "highpass": HighpassAugmentor(self.sampling_rate).augment,
                "codec": CodecAugmentor(self.sampling_rate).augment,
                "hilbert": HilbertAugmentor(self.sampling_rate).augment,
            }
        print(f"Dataset [{self.name}] is ready!\n")

    # ------------------------------------------------------------------
    # corpus / label statistics
    # ------------------------------------------------------------------

    def get_files_with_labels(self, main_dir, config_path):
        main_dir = Path(main_dir)
        results = None
        for subdir in main_dir.glob("*/"):
            try:
                for config_file in subdir.glob(config_path):
                    config_dict = json.loads(config_file.read_text())
                    print("Loading [{}]...".format(config_dict["name"]))
                    complex_data = parse_complex_data(
                        subdir, Path(self.data_dir), config_dict["config"], config_dict["result"]
                    )
                    print("[{}] loaded successfully!".format(config_dict["name"]))
                    results = (
                        complex_data
                        if results is None
                        else pd.concat([results, complex_data], axis=0, ignore_index=True)
                    )
            except Exception as e:
                print(e)
                print("Data config was not found or invalid, moving on.")
                continue
        return results

    def remove_rows_from_files_with_labels(self, rows_to_remove):
        if len(rows_to_remove) > 0:
            self.files_with_labels = self.files_with_labels.drop(rows_to_remove).reset_index(drop=True)

    def get_all_label_options_weights(self):
        """Class-frequency ratios per label (ref :172-219), with corrupt-row
        quarantine recorded to rows_to_remove.pickle."""
        import multiprocessing

        label_options: dict = {}
        label_totals: dict = {}

        workers = self.num_workers or min(16, multiprocessing.cpu_count())
        indices = range(len(self))
        if workers > 1:
            with multiprocessing.Pool(workers) as pool:
                timed_labels_counts = pool.map(self.get_timed_labels_value_counts_by_index, indices)
        else:
            timed_labels_counts = [self.get_timed_labels_value_counts_by_index(i) for i in indices]

        rows_to_remove = [i for i, c in enumerate(timed_labels_counts) if isinstance(c, Exception)]
        valid_counts = [c for c in timed_labels_counts if not isinstance(c, Exception)]
        create_pickle_cache(
            lambda: rows_to_remove,
            os.path.join(self.cache_dir, self.source, "rows_to_remove.pickle"),
        )
        self.remove_rows_from_files_with_labels(rows_to_remove)
        if not valid_counts:
            raise RuntimeError("no valid items — every row failed label parsing")

        for col in labels_to_use:
            col_value_counts = self.files_with_labels[col].value_counts()
            label_options[col] = {
                "true": dict(col_value_counts),
                "false": dict(-col_value_counts + len(self.files_with_labels)),
            }
            label_totals[col] = len(self.files_with_labels)

        total_amount = len(valid_counts)
        for label in valid_counts[0][0]:
            label_options[label] = {"true": {}, "false": {}}
            label_totals[label] = total_amount
        for true_counts, false_counts in valid_counts:
            for label in timed_labels_to_use:
                for key in true_counts[label]:
                    tv, fv = true_counts[label][key], false_counts[label][key]
                    if key not in label_options[label]["true"]:
                        label_options[label]["true"][key] = 0
                        label_options[label]["false"][key] = total_amount
                    label_options[label]["true"][key] += 0 if tv == 0 else 1
                    label_options[label]["false"][key] -= 1 if fv == 0 else 0

        for label in label_options:
            total = label_totals[label]
            for key in label_options[label]["true"]:
                label_options[label]["true"][key] /= total
                label_options[label]["false"][key] /= total
        return {
            key: {
                "true": self.sort_options(value["true"], none_ratio=0.0),
                "false": self.sort_options(value["false"], none_ratio=1.0),
            }
            for key, value in label_options.items()
        }

    def sort_options(self, options: dict, none_ratio=0.0):
        result = OrderedDict()
        if "none" not in options:
            options["none"] = none_ratio
        items = sorted(options.items(), key=lambda pair: pair[1], reverse=True)
        keys = [k for k, _v in items]
        keys.remove("none")
        keys.insert(0, "none")
        for key in keys:
            result[key] = options[key]
        return result

    def get_timed_labels_value_counts_by_index(self, i):
        try:
            if self.size < len(self.files_with_labels):
                i = (int(len(self.files_with_labels) / PHI) * i) % len(self.files_with_labels)
            _labels, timed_labels = self.get_timed_labels(i)
            return self.get_labels_value_counts(timed_labels)
        except Exception as e:
            print(f"Item {i} failed to get timed labels: [{e}]")
            return e

    def get_labels_value_counts(self, timed_labels):
        true_labels, false_labels = {}, {}
        for label, timed_label in timed_labels.items():
            if label in timed_labels_to_use:
                timed_label = timed_label.copy()
                timed_label["length"] = timed_label["end"] - timed_label["start"]
                length_sum = timed_label["length"].sum()
                true_labels[label] = dict(timed_label.groupby(["text"])["length"].sum())
                false_labels[label] = {k: length_sum - v for k, v in true_labels[label].items()}
        return true_labels, false_labels

    # ------------------------------------------------------------------
    # timed labels
    # ------------------------------------------------------------------

    def get_timed_labels(self, index):
        all_labels = self.files_with_labels.iloc[index]
        labels = self.get_labels(index)
        timed_labels = parse_textgrid(self.data_dir, all_labels["textgrid"])
        timed_labels = self.add_sad_timed_labels(timed_labels)
        timed_labels = self.add_sad_based_timed_labels(labels, timed_labels)
        timed_labels = {k: v for k, v in timed_labels.items() if k in timed_labels_to_use}
        return labels, timed_labels

    def add_sad_timed_labels(self, timed_labels):
        sad = timed_labels["words"].copy()
        sad["text"] = sad["text"].apply(lambda x: "silence" if x == "" else "speech")
        timed_labels["sad"] = sad
        return timed_labels

    def add_sad_based_timed_labels(self, labels, timed_labels):
        for label in sad_based_labels:
            value = labels[label]
            timed_label = timed_labels["sad"].copy()
            timed_label["text"] = timed_label["text"].apply(
                lambda x: "silence" if x == "silence" else value
            )
            timed_labels[label] = timed_label
        return timed_labels

    def get_labels(self, index):
        return self.files_with_labels[labels_to_use].iloc[index]

    def get_grouped_labels(self, index):
        labels = self.get_labels(index)
        return {
            group: labels.filter(group_labels).to_dict()
            for group, group_labels in label_groups.items()
        }

    # ------------------------------------------------------------------
    # segmented label tensors (pickle-cached per item)
    # ------------------------------------------------------------------

    def get_pickle_label(self, index):
        return do_with_pickle_cache(
            lambda: self.get_fresh_label(index),
            os.path.join(self.cache_dir, self.source, "labels_cache", f"{index}.pickle"),
        )

    def create_pickle_label(self, index):
        return create_pickle_cache(
            lambda: self.get_fresh_label(index),
            os.path.join(self.cache_dir, self.source, "labels_cache", f"{index}.pickle"),
        )

    def get_fresh_label(self, index):
        labels, timed_labels = self.get_timed_labels(index)
        segmented = self.get_segmented_timed_labels(timed_labels)
        segmented = self.add_segmented_labels(segmented, labels)
        return self.convert_segmented_labels_to_tensor(segmented, label_groups)

    def get_segmented_timed_labels(self, timed_labels):
        return pd.concat(
            [
                self.get_segmented_timed_labels_for_single(name, tl)
                for name, tl in timed_labels.items()
            ],
            axis=1,
        )

    def get_segmented_timed_labels_for_single(self, label_name, timed_label):
        time_interval = self.embedding_size / self.sampling_rate
        start_time = timed_label.iloc[0]["start"]
        end_time = timed_label.iloc[-1]["end"]
        segmented_length = int((end_time - start_time) // time_interval)
        values = ["none"] * segmented_length
        for _idx, row in timed_label.iterrows():
            lo = int(row["start"] // time_interval)
            hi = int(row["end"] // time_interval)
            for j in range(lo, min(hi, segmented_length)):
                values[j] = row["text"]
        return pd.DataFrame({label_name: values})

    def add_segmented_labels(self, segmented_timed_labels, labels):
        for col in labels.index:
            if col not in segmented_timed_labels:
                segmented_timed_labels[col] = labels[col]
        return segmented_timed_labels

    def convert_segmented_labels_to_tensor(self, all_segmented_labels, given_label_groups):
        all_tensors = {}
        for key, labels in given_label_groups.items():
            tensors = {}
            for col in labels:
                if col in all_segmented_labels:
                    tensors[col] = np.asarray(
                        all_segmented_labels[col]
                        .apply(lambda x: self.label_options[col].index(x))
                        .tolist(),
                        dtype=np.int64,
                    )
            all_tensors[key] = tensors
        return all_tensors

    # ------------------------------------------------------------------
    # item access
    # ------------------------------------------------------------------

    def __len__(self):
        return min(len(self.files_with_labels), self.size)

    def __getitem__(self, index):
        currand = random.Random()
        if self.deterministic:
            currand.seed(index)
        if self.size < len(self.files_with_labels):
            index = (int(len(self.files_with_labels) / PHI) * index) % len(self.files_with_labels)
        return self.get_augmented_item(index, currand)

    def get_augmented_item(self, index, currand):
        wav, wav_path, time_labels, grouped_labels = self.get_cut_item(index, currand)
        if self.should_augment:
            wav, time_labels, grouped_labels = self.augment_item(
                wav, time_labels, grouped_labels, currand
            )
        return wav, wav_path, time_labels, grouped_labels

    def get_wav(self, index):
        wav_path = get_path_by_glob(
            self.data_dir, self.files_with_labels.iloc[index]["wav"]
        )
        if self.disable_wavs:
            return np.zeros((self.segment_length,), np.float32), str(wav_path)
        audio, sr = load_wav(wav_path)
        if sr != self.sampling_rate:
            raise ValueError(f"{sr} SR doesn't match target {self.sampling_rate} SR")
        return audio[0].astype(np.float32), str(wav_path)

    def get_cut_item(self, index, currand):
        wav, wav_path = self.get_wav(index)
        pickle_label_groups = self.get_pickle_label(index)
        # deep-copy the cached label dict before cutting in place
        pickle_label_groups = {
            k: {l: v.copy() for l, v in g.items()} for k, g in pickle_label_groups.items()
        }
        length = wav.shape[0]
        emb_seg_len = self.segment_length // self.embedding_size
        emb_len = min(
            length // self.embedding_size,
            next(iter(next(iter(pickle_label_groups.values())).values())).shape[0],
        )
        trimmed = emb_len * self.embedding_size
        if len(wav) > trimmed:
            wav = wav[:trimmed]
        length = wav.shape[0]

        if length >= self.segment_length:
            max_emb_start = emb_len - emb_seg_len
            emb_start = currand.randint(0, max_emb_start)
            start = emb_start * self.embedding_size
        else:
            emb_padding = emb_seg_len - emb_len
            prefix_emb_pad = currand.randint(0, emb_padding)
            postfix_emb_pad = emb_padding - prefix_emb_pad
            prefix_pad = prefix_emb_pad * self.embedding_size
            postfix_pad = postfix_emb_pad * self.embedding_size

        for key, group in pickle_label_groups.items():
            for label, item in group.items():
                item = item[:emb_len]
                if length >= self.segment_length:
                    cut = item[emb_start : emb_start + emb_seg_len]
                else:
                    cut = np.pad(item, (prefix_emb_pad, postfix_emb_pad))
                group[label] = cut

        if length >= self.segment_length:
            wav = wav[start : start + self.segment_length]
        else:
            wav = np.pad(wav, (prefix_pad, postfix_pad))

        grouped_labels = self.get_grouped_labels(index)
        return wav, wav_path, pickle_label_groups, grouped_labels

    # ------------------------------------------------------------------
    # augmentation
    # ------------------------------------------------------------------

    def augment_item(self, cut_wav, cut_label, grouped_labels, currand):
        options, probs, methods = self.aug_options, self.aug_probs, self.aug_methods
        length = next(iter(next(iter(cut_label.values())).values())).shape[0]
        augmented_wav = cut_wav
        augmented_label = pd.DataFrame(["none"] * length, columns=["none"])
        should_augment = probs["prob"] > currand.random()
        for augmentation in options.keys():
            augmented_wav, augmented_label, value = self.augment_item_with(
                augmented_wav, augmented_label, cut_label, methods, options, probs,
                augmentation, currand, should_augment,
            )
            for section, current_groups in augmentation_label_groups.items():
                if augmentation in current_groups:
                    grouped_labels[section][augmentation] = value
        augmentation_tensors = self.convert_segmented_labels_to_tensor(
            augmented_label, augmentation_label_groups
        )
        for key in cut_label.keys():
            for label, value in augmentation_tensors.get(key, {}).items():
                cut_label[key][label] = value
        return augmented_wav, cut_label, grouped_labels

    def augment_item_with(self, augmented_wav, augmented_label, cut_label, methods,
                          options, probs, aug_type, currand, should=True):
        value = "disabled"
        sub_probs = probs["sub_probs"][aug_type]
        if should and sub_probs["prob"] > currand.random():
            value = currand.choice(options[aug_type])
            augmented_label, augmented_wav, value = methods[aug_type](
                currand, augmented_label, cut_label, augmented_wav, value, self.disable_wavs
            )
        augmented_label[aug_type] = value
        return augmented_wav, augmented_label, value

    # ------------------------------------------------------------------
    # batching for the distill trainer
    # ------------------------------------------------------------------

    def batches(self, batch_size, shuffle=True, drop_last=True, seed=1234,
                process_index=0, process_count=1):
        """Stacked host batches: {'audio': (B, T), 'time_labels':
        {group: {label: (B, T_emb) int}}, 'paths': [...], 'grouped_labels':
        [...]} — static shapes, per-host strided sharding."""
        rng = np.random.default_rng(seed)
        order = np.arange(len(self))
        if shuffle:
            rng.shuffle(order)
        order = order[process_index::process_count]
        n = len(order)
        end = n - n % batch_size if drop_last else n
        for i in range(0, end, batch_size):
            items = [self[int(j)] for j in order[i : i + batch_size]]
            audio = np.stack([it[0] for it in items])
            time_labels = {
                g: {
                    l: np.stack([it[2][g][l] for it in items])
                    for l in items[0][2][g]
                }
                for g in items[0][2]
            }
            yield {
                "audio": audio.astype(np.float32),
                "time_labels": time_labels,
                "paths": [it[1] for it in items],
                "grouped_labels": [it[3] for it in items],
            }
