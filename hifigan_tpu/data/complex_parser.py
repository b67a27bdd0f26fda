"""Declarative dataset-manifest engine.

Capability parity with reference speech_distillation/complex_data_parser.py:
data configs declare `sources` (csv / glob) plus `enrichments`
(regex / files / join / select / rename / retype) that build a pandas
DataFrame of per-utterance rows (wav path, textgrid path, speaker, sex,
mic-brand, ...). Pure host-side pandas; no torch.
"""

from __future__ import annotations

import random
import re
from pathlib import Path

import pandas as pd


def parse_complex_data(subdir, data_dir, data_config, result_group) -> pd.DataFrame:
    all_labels: dict[str, pd.DataFrame] = {}
    for data_group in data_config:
        group_name = data_group["group-name"]
        all_labels[group_name] = parse_group_sources_labels(subdir, data_dir, data_group)
        for enrichment in data_group.get("enrichments", []):
            parse_enrichment_labels(subdir, data_dir, group_name, enrichment, all_labels)
    return all_labels[result_group]


def parse_enrichment_labels(subdir, data_dir, group_name, enrichment, all_labels) -> None:
    etype = enrichment["type"]
    if etype == "regex":
        parse_regex_labels(group_name, enrichment, all_labels)
    elif etype == "files":
        parse_files_labels(subdir, data_dir, group_name, enrichment, all_labels)
    elif etype == "join":
        parse_join_labels(group_name, enrichment, all_labels)
    elif etype == "select":
        all_labels[group_name] = all_labels[group_name][enrichment["labels"]]
    elif etype == "rename":
        all_labels[group_name] = all_labels[group_name].rename(columns=enrichment["mapping"])
    elif etype == "retype":
        parse_retype_labels(group_name, enrichment, all_labels)
    else:
        raise ValueError(f"Unknown enrichment type - {etype}")
    all_labels[group_name] = all_labels[group_name].infer_objects()


def parse_regex_labels(group_name, enrichment, all_labels) -> None:
    group_labels = all_labels[group_name]
    all_regex_labels = []
    for label, pattern in enrichment["patterns"].items():
        regex_groups = [
            _regex_of_value(row, label, pattern) for _, row in group_labels.iterrows()
        ]
        all_regex_labels.append(pd.DataFrame(regex_groups))
    all_labels[group_name] = pd.concat([group_labels, *all_regex_labels], axis=1)


def _regex_of_value(row, label, pattern) -> dict:
    match = re.search(resolve_label_references(pattern, row.to_dict()), str(row[label]))
    if match is None:
        raise ValueError(f"regex {pattern!r} did not match {row[label]!r}")
    return match.groupdict()


def parse_files_labels(subdir, data_dir, group_name, enrichment, all_labels) -> None:
    group_labels = all_labels[group_name]
    sample_row = group_labels.iloc[0]
    for label, pattern in enrichment["labels"].items():
        # fail fast if the pattern resolves to nothing for the first row
        get_path_by_glob(data_dir, resolve_label_references(pattern, sample_row.to_dict()))
        group_labels[label] = group_labels.apply(
            axis=1, func=lambda row: resolve_label_references(pattern, row.to_dict())
        )
    all_labels[group_name] = group_labels


def parse_retype_labels(group_name, enrichment, all_labels) -> None:
    group_labels = all_labels[group_name]
    casts = {"int": int, "str": str, "float": float}
    for label, new_type in enrichment["mapping"].items():
        if new_type in casts:
            group_labels[label] = group_labels[label].astype(casts[new_type])
    all_labels[group_name] = group_labels


def parse_join_labels(group_name, enrichment, all_labels) -> None:
    merged = pd.merge(
        all_labels[group_name],
        all_labels[enrichment["other-group-name"]],
        left_on=enrichment["base-label"],
        right_on=enrichment["other-label"],
    )
    all_labels[group_name] = merged


def parse_group_sources_labels(subdir, data_dir, data_group) -> pd.DataFrame:
    group_labels = None
    for source in data_group["sources"]:
        rows = parse_rows_from_source(subdir, data_dir, source)
        if group_labels is None:
            group_labels = rows
        else:
            group_labels = pd.concat([group_labels, rows], axis=0, ignore_index=True)
    for label, value in data_group.get("group-labels", {}).items():
        group_labels[label] = value
    group_labels["subdir"] = str(subdir)
    return group_labels


def parse_rows_from_source(subdir, data_dir, source) -> pd.DataFrame:
    stype = source["type"]
    if stype == "csv":
        results = parse_rows_from_csv(subdir, data_dir, source)
    elif stype == "glob":
        results = parse_rows_from_glob(subdir, data_dir, source)
    else:
        raise ValueError(f"Unknown source type - {stype}")
    if "size" in source:
        results = results[: source["size"]]
    return results


def parse_rows_from_csv(subdir, data_dir, source) -> pd.DataFrame:
    path = get_path_by_glob(data_dir, source["path"])
    csv = pd.read_csv(
        path,
        delimiter=source["delimiter"],
        skiprows=source["skiprows"],
        skipinitialspace=True,
        index_col=False,
    )
    csv.columns = map(str.strip, csv.columns)
    return csv


def parse_rows_from_glob(subdir, data_dir, source) -> pd.DataFrame:
    glob_files = list(Path(data_dir).glob(source["glob"]))
    return pd.DataFrame(glob_files, columns=[source["label"]])


def get_path_by_glob(subdir, glob_pattern) -> Path:
    files = list(Path(subdir).glob(str(glob_pattern)))
    if not files:
        raise FileNotFoundError(f"Missing file [{glob_pattern}] in [{subdir}]")
    return min(files, key=lambda x: len(str(x)))


def get_rand_by_glob(subdir, glob_pattern, rng: random.Random | None = None) -> Path:
    files = list(Path(subdir).glob(str(glob_pattern)))
    if not files:
        raise FileNotFoundError(f"Missing file [{glob_pattern}] in [{subdir}]")
    return (rng or random).choice(files)


def resolve_label_references(input_to_resolve: str, labels: dict) -> str:
    for label, value in labels.items():
        input_to_resolve = input_to_resolve.replace("{%s}" % label, str(value))
    return input_to_resolve
