"""SCOPe structural split dataset.

Reference semantics: esm/data.py:381-493 (ESMStructuralSplitDataset) — 5-fold
CV splits at family/superfamily/fold level; items are {seq, ssp, dist, coords}
pickles; tarballs downloaded with MD5 verification.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import shutil
import urllib.request
from pathlib import Path


class ESMStructuralSplitDataset:
    """Structural Split Dataset (Rives et al. supplement A.10).

    For each SCOPe domain: seq (L string), ssp (L string), dist (LxL array),
    coords (Lx3 array). Splits: splits/{split_level}/{cv_partition}/{split}.txt.
    """

    base_folder = "structural-data"
    file_list = [
        (
            "https://dl.fbaipublicfiles.com/fair-esm/structural-data/splits.tar.gz",
            "splits.tar.gz",
            "splits",
            "456fe1c7f22c9d3d8dfe9735da52411d",
        ),
        (
            "https://dl.fbaipublicfiles.com/fair-esm/structural-data/pkl.tar.gz",
            "pkl.tar.gz",
            "pkl",
            "644ea91e56066c750cd50101d390f5db",
        ),
    ]

    def __init__(
        self,
        split_level: str,
        cv_partition: str,
        split: str,
        root_path: str = os.path.expanduser("~/.cache/esm_tpu/data"),
        download: bool = False,
    ):
        assert split in ("train", "valid"), "split must be 'train' or 'valid'"
        self.root_path = root_path
        self.base_path = os.path.join(self.root_path, self.base_folder)

        if download:
            self.download()

        self.split_file = os.path.join(
            self.base_path, "splits", split_level, cv_partition, f"{split}.txt"
        )
        self.pkl_dir = os.path.join(self.base_path, "pkl")
        with open(self.split_file) as f:
            self.names = f.read().splitlines()

    def __len__(self) -> int:
        return len(self.names)

    def _check_exists(self) -> bool:
        return all(
            os.path.isdir(os.path.join(self.base_path, filename))
            for _, _, filename, _ in self.file_list
        )

    @staticmethod
    def _md5(path: str) -> str:
        h = hashlib.md5()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        return h.hexdigest()

    def download(self):
        if self._check_exists():
            print("Files already downloaded and verified")
            return
        os.makedirs(self.base_path, exist_ok=True)
        for url, tar_filename, _, md5_hash in self.file_list:
            download_path = os.path.join(self.base_path, tar_filename)
            if not os.path.exists(download_path):
                urllib.request.urlretrieve(url, download_path)
            if self._md5(download_path) != md5_hash:
                raise RuntimeError(f"MD5 mismatch for {tar_filename}")
            shutil.unpack_archive(download_path, self.base_path)

    def __getitem__(self, idx: int) -> dict:
        name = self.names[idx]
        pkl_fname = os.path.join(self.pkl_dir, name[1:3], f"{name}.pkl")
        with open(pkl_fname, "rb") as f:
            return pickle.load(f)
