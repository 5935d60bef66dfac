"""Example: AudioReaderPE — decode a compressed/With-header audio file
with resampling and peak normalization.

Reference counterpart: examples/audio_reader_eg.py (miniaudio decode;
here the decoder path handles WAV natively and normalizes peaks).
"""

from _common import finish, make_drum_wav, pg


def build():
    src = pg.AudioReaderPE(make_drum_wav(), max_level_db=-3.0)
    ext = src.extent()
    print(f"decoded {ext.end - ext.start} samples, "
          f"{src.channel_count()} channel(s)")
    return src


if __name__ == "__main__":
    finish(build(), "audio_reader_eg")
