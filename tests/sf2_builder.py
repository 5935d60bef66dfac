"""Shim: the SF2 builder lives in pygmu2_tpu.soundfont.build."""
from pygmu2_tpu.soundfont.build import *  # noqa: F401,F403
from pygmu2_tpu.soundfont.build import build_sf2, make_looped_sample  # noqa: F401
