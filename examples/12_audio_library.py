"""Example 12: AudioLibrary — Strudel-style sample maps.

The reference fetches a strudel.json from a URL; this environment has
no network, so the example writes a local sample map pointing at
synthesized WAVs and plays a pattern from it (same AudioLibrary and
reader() machinery; ``AudioLibrary.from_url`` works identically given
connectivity). Reference counterpart: examples/12_audio_library.py.
"""

import json
from pathlib import Path

from _common import SAMPLE_RATE, finish, make_drum_wav, pg


def build():
    lib_dir = Path("/tmp/pygmu2_tpu_library")
    lib_dir.mkdir(exist_ok=True)
    make_drum_wav(str(lib_dir / "kick.wav"), seconds=0.4)
    make_drum_wav(str(lib_dir / "snare.wav"), seconds=0.25)
    (lib_dir / "strudel.json").write_text(
        json.dumps({"kick": ["kick.wav"], "snare": ["snare.wav"]})
    )

    lib = pg.AudioLibrary.from_strudel_json(lib_dir / "strudel.json")
    print("library keys:", lib.keys)

    beat = SAMPLE_RATE // 2
    pattern = []
    for i in range(8):
        name = "kick" if i % 2 == 0 else "snare"
        pattern.append((pg.CropPE(lib.reader(name), 0, beat), i * beat))
    return pg.SequencePE(*pattern)


if __name__ == "__main__":
    finish(build(), "12_audio_library")
