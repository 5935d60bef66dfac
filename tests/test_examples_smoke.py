"""Every example with a build() renders a non-silent prefix.

Examples are executable documentation (reference ships 33 runnable
scripts, SURVEY §1 L7); this smoke test imports each new-style example
module and renders the head of its graph through the public API.
"""

import importlib
import sys
from pathlib import Path

import numpy as np
import pytest

import pygmu2_tpu as pg
pytestmark = pytest.mark.slow  # breadth/fuzz sweep (minutes); fast set = -m 'not slow'

EXAMPLES = Path(__file__).resolve().parents[1] / "examples"
sys.path.insert(0, str(EXAMPLES))

MODULES = sorted(
    p.stem
    for p in EXAMPLES.glob("*.py")
    if "def build()" in p.read_text() and p.stem != "_common"
)


@pytest.mark.parametrize("name", MODULES)
def test_example_renders_nonsilent(name):
    pg.set_sample_rate(44100)
    mod = importlib.import_module(name)
    graph = mod.build()
    head = pg.CropPE(graph, 0, 16384)
    out = np.asarray(pg.render_to_array(head))
    assert np.isfinite(out).all()
    assert np.abs(out).max() > 1e-4, f"{name} rendered silence"


def test_every_reference_example_number_has_a_counterpart():
    """Reference examples/*.py (non-disabled) → a repo example exists
    covering the same number/name."""
    ours = {p.stem for p in EXAMPLES.glob("*.py")}
    expected = [
        "00_template_eg", "01_hello_sine", "02_play_wav", "03_looping",
        "04_filtering", "05_flanging", "06_autowah", "07_soft_clipping",
        "08_write_to_file", "10_compression", "11_dynamics",
        "12_audio_library", "15_reverse_pitch_echo", "16_comb_filter",
        "17_ladder_filter", "19_sequence_examples",
        "20_alternative_temperaments", "20_timewarp", "21_analog_osc",
        "22_function_gen", "23_convolution", "27_spatial",
        "29_karplus_strong", "33_piecewise", "35_random_select",
        "37_sequence_eg", "adsr_eg", "audio_reader_eg",
        "demo_asset_manager", "random_select_eg", "reverb_eg",
        "super_saw_eg", "tralfam_eg",
    ]
    missing = [e for e in expected if e not in ours]
    assert not missing, f"missing example counterparts: {missing}"
