"""Preset manager — named archives on disk.

Semantic equivalent of cpl's CPresetManager (ref: usage at
PluginProcessor.cpp:83-101 default-preset load and the CPresetWidget;
presets shipped as Make/Skeleton/presets/*.sgn). Files are ``.sgz``
(our JSON archive format, see state/serialize.py).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional

from signalizer_tpu.state.serialize import Archive

PRESET_EXTENSION = ".sgz"
DEFAULT_PRESET_NAME = "default.main"


class PresetManager:
    def __init__(self, directory):
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)

    def _path(self, name: str) -> Path:
        return self.directory / (name + PRESET_EXTENSION)

    def list_presets(self) -> List[str]:
        return sorted(
            p.name[: -len(PRESET_EXTENSION)]
            for p in self.directory.glob(f"*{PRESET_EXTENSION}")
        )

    def save(self, name: str, archive: Archive) -> Path:
        path = self._path(name)
        tmp = path.with_suffix(".tmp")
        tmp.write_bytes(archive.to_bytes())
        os.replace(tmp, path)  # atomic
        return path

    def load(self, name: str) -> Archive:
        return Archive.from_bytes(self._path(name).read_bytes())

    def try_load(self, name: str) -> Optional[Archive]:
        try:
            return self.load(name)
        except (FileNotFoundError, ValueError):
            return None

    def load_default(self) -> Optional[Archive]:
        """ref: default.main.sgn loaded at plugin construction."""
        return self.try_load(DEFAULT_PRESET_NAME)

    def delete(self, name: str) -> bool:
        try:
            self._path(name).unlink()
            return True
        except FileNotFoundError:
            return False
