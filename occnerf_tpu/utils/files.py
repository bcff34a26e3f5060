"""File listing helpers, mirroring `core/utils/file_util.py`."""

from __future__ import annotations

import os
from typing import List, Optional, Tuple


def list_files(folder_path: str, exts: Optional[List[str]] = None,
               keyword: Optional[str] = None) -> List[str]:
    out = [
        os.path.join(folder_path, fname)
        for fname in os.listdir(folder_path)
        if os.path.isfile(os.path.join(folder_path, fname))
        and (exts is None or any(fname.endswith(e) for e in exts))
        and (keyword is None or keyword in fname)
    ]
    return sorted(out)


def split_path(file_path: str) -> Tuple[str, str, str]:
    file_dir, file_name = os.path.split(file_path)
    base, ext = os.path.splitext(file_name)
    return file_dir, base, ext
