"""Offline binarization: raw wav tree -> indexed binary splits.

Parity targets: reference ``preprocessing/base_binarizer.py`` and
``preprocessing/SVCpre.py`` —

- item discovery: rglob ``*.wav``/``*.ogg`` under ``raw_data_dir``,
- split: last 5 items = test = valid (or ``test_prefixes`` when
  ``choose_test_manually``),
- per split: per-item features (mel, f0, pitch, hubert, mel2ph) into an
  ``IndexedDatasetBuilder``; item skipped on empty f0,
- the train split's global spec_min/spec_max are **written back into the
  YAML config** (base_binarizer.py:174-183),
- ``{prefix}_lengths.npy`` dumped per split; ``spk_map.json`` dumped.

Items are processed with a multiprocessing pool (the reference imports but
bypasses its pool; feature extraction here is jit-compiled JAX, so processes
default to 1 and the pipeline batches instead).
"""

from __future__ import annotations

import json
import os
import random
from copy import deepcopy
from pathlib import Path
from typing import Dict, List

import numpy as np

from ..config.hparams import HParams, write_back_spec_stats
from . import features
from .indexed_datasets import IndexedDatasetBuilder


class BinarizationError(features.BinarizationError):
    pass


class BaseBinarizer:
    def __init__(self, hp: HParams):
        self.hp = hp
        self.binarization_args = hp["binarization_args"]
        self.items: Dict[str, Dict] = {}
        self.load_meta_data()
        self.item_names = sorted(self.items.keys())
        if self.binarization_args.get("shuffle"):
            random.seed(1234)
            random.shuffle(self.item_names)

    def load_meta_data(self):
        raise NotImplementedError

    @property
    def train_item_names(self) -> List[str]:
        raise NotImplementedError

    @property
    def valid_item_names(self) -> List[str]:
        raise NotImplementedError

    @property
    def test_item_names(self) -> List[str]:
        raise NotImplementedError

    def build_spk_map(self):
        spk_map = sorted({self.items[n]["spk_id"] for n in self.item_names})
        spk_map = {x: i for i, x in enumerate(spk_map)}
        assert len(spk_map) == 0 or len(spk_map) <= self.hp["num_spk"], len(spk_map)
        return spk_map

    def item_name2spk_id(self, item_name):
        return self.spk_map[self.items[item_name]["spk_id"]]

    def _phone_encoder(self):
        from ..infer.hubert_encoder import Hubertencoder

        return Hubertencoder(self.hp["hubert_path"], hp=self.hp)

    def meta_data_iterator(self, prefix: str):
        names = {"valid": self.valid_item_names, "test": self.test_item_names}.get(
            prefix, self.train_item_names)
        for item_name in names:
            yield item_name, self.items[item_name]

    def process(self):
        hp = self.hp
        os.makedirs(hp["binary_data_dir"], exist_ok=True)
        self.spk_map = self.build_spk_map()
        print("| spk_map: ", self.spk_map)
        with open(f"{hp['binary_data_dir']}/spk_map.json", "w", encoding="utf-8") as f:
            json.dump(self.spk_map, f)
        self.phone_encoder = self._phone_encoder()
        self.process_data_split("valid")
        self.process_data_split("test")
        self.process_data_split("train")

    def process_item(self, item_name: str, meta_data: Dict):
        return features.process_item(
            item_name, meta_data["wav_fn"], self.hp,
            self.phone_encoder.encode, self.binarization_args,
            use_crepe=self.hp.get("use_crepe", False),
            spk_id=self.item_name2spk_id(item_name),
            tg_fn=meta_data.get("tg_fn"), ph=meta_data.get("ph"))

    def process_data_split(self, prefix: str):
        hp = self.hp
        data_dir = hp["binary_data_dir"]
        builder = IndexedDatasetBuilder(f"{data_dir}/{prefix}")
        lengths, spec_min, spec_max = [], [], []
        total_sec = 0.0
        args = list(self.meta_data_iterator(prefix))

        batch_size = int(hp.get("binarize_batch_size", 8) or 0)
        use_batched = (batch_size > 1 and not hp.get("use_crepe", False)
                       and hasattr(self.phone_encoder, "encode_batch")
                       and getattr(self.phone_encoder, "params", None) is not None)
        if use_batched:
            # batched device pipeline: one f0 track + one hubert encode per
            # item group (grouped by waveform bucket)
            metas = [(name, meta["wav_fn"]) for name, meta in reversed(args)]
            spk_ids = [self.item_name2spk_id(name) for name, _ in metas]
            items_by_idx = {}
            for i, item in features.process_items_batched(
                    metas, hp, self.phone_encoder.encode_batch,
                    self.binarization_args, spk_ids=spk_ids,
                    group_size=batch_size):
                items_by_idx[i] = item
            ordered = [items_by_idx.get(i) for i in range(len(metas))]
        else:
            ordered = (self.process_item(name, meta)
                       for name, meta in reversed(args))

        for item in ordered:
            if item is None:
                continue
            spec_min.append(item["spec_min"])
            spec_max.append(item["spec_max"])
            if not self.binarization_args.get("with_wav") and "wav" in item:
                del item["wav"]
            builder.add_item(item)
            lengths.append(item["len"])
            total_sec += item["sec"]
        if prefix == "train" and spec_min:
            write_back_spec_stats(hp, np.min(spec_min, 0).tolist(),
                                  np.max(spec_max, 0).tolist())
        builder.finalize()
        np.save(f"{data_dir}/{prefix}_lengths.npy", lengths)
        print(f"| {prefix} total duration: {total_sec:.3f}s ({len(lengths)} items)")


class SVCBinarizer(BaseBinarizer):
    """SVC data: every wav/ogg under raw_data_dir is one item; no text."""

    def __init__(self, hp: HParams):
        super().__init__(hp)
        print("spkers: ", {v["spk_id"] for v in self.items.values()})
        self._train_item_names, self._test_item_names = \
            self.split_train_test_set(self.item_names)

    def split_train_test_set(self, item_names):
        item_names = deepcopy(item_names)
        if self.hp.get("choose_test_manually"):
            test_item_names = [x for x in item_names if any(
                x.startswith(ts) for ts in self.hp["test_prefixes"])]
        else:
            test_item_names = item_names[-5:]
        train_item_names = [x for x in item_names if x not in set(test_item_names)]
        print(f"| train {len(train_item_names)} test {len(test_item_names)}")
        return train_item_names, test_item_names

    @property
    def train_item_names(self):
        return self._train_item_names

    @property
    def valid_item_names(self):
        return self._test_item_names

    @property
    def test_item_names(self):
        return self._test_item_names

    def load_meta_data(self):
        raw_data_dir = Path(self.hp["raw_data_dir"])
        files = list(raw_data_dir.rglob("*.wav")) + list(raw_data_dir.rglob("*.ogg"))
        multi_spk = bool(self.hp.get("use_spk_id")) and int(self.hp.get("num_spk", 1)) > 1

        def spk_of(fn: Path):
            if multi_spk:
                # multi-speaker: each first-level subdirectory is a speaker
                rel = fn.relative_to(raw_data_dir)
                if len(rel.parts) > 1:
                    return rel.parts[0]
            # str() so build_spk_map's sorted() never mixes int and str ids
            # (a stray top-level wav next to speaker subdirs would crash)
            return str(self.hp.get("speaker_id", 0))

        self.items = {
            str(fn): {"wav_fn": str(fn), "spk_id": spk_of(fn)} for fn in files}


def binarize(hp: HParams):
    """CLI body (reference preprocessing/binarize.py): resolve binarizer_cls
    from config and run."""
    import importlib

    name = hp.get("binarizer_cls", "diffsvc_tpu.data.binarizer.SVCBinarizer")
    name = name.replace("preprocessing.SVCpre", "diffsvc_tpu.data.binarizer")
    name = name.replace("preprocessing.base_binarizer", "diffsvc_tpu.data.binarizer")
    pkg, cls_name = name.rsplit(".", 1)
    cls = getattr(importlib.import_module(pkg), cls_name)
    print("| Binarizer: ", cls)
    cls(hp).process()
