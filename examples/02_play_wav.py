"""Example 02: load a WAV file and play/bounce it.

Reference counterpart: examples/02_play_wav.py (which ships faun.wav;
this mirror synthesizes its sample first — same WavReaderPE path).
"""

from _common import finish, make_drum_wav, pg


def build():
    src = pg.WavReaderPE(make_drum_wav())
    ext = src.extent()
    print(f"channels={src.channel_count()} samples={ext.end - ext.start}")
    return src


if __name__ == "__main__":
    finish(build(), "02_play_wav")
