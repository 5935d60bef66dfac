#!/usr/bin/env python
"""Repackage a KEMAR compact dataset directory as stereo WAVs.

Reference counterpart: scripts/convert_kemar_to_wav.py. The bundled
dataset (pygmu2_tpu/assets/kemar) is already WAV; this tool exists for
users importing the original MIT 'compact' .dat distribution.

Usage: python scripts/convert_kemar_to_wav.py SRC_DIR DST_DIR
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pygmu2_tpu.utils import wavio  # noqa: E402


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        return 1
    src, dst = Path(sys.argv[1]), Path(sys.argv[2])
    dst.mkdir(parents=True, exist_ok=True)
    count = 0
    for dat in sorted(src.rglob("*.dat")):
        # compact set: interleaved stereo int16, big-endian, 44.1 kHz
        raw = np.frombuffer(dat.read_bytes(), dtype=">i2").astype(np.float32) / 32768.0
        stereo = raw.reshape(-1, 2)
        wavio.write_wav(dst / (dat.stem + ".wav"), stereo, 44100, fmt="pcm16")
        count += 1
    print(f"converted {count} files → {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
