"""AssetManager / AudioLibrary / debug utilities (offline paths)."""

import json

import numpy as np
import pytest

from pygmu2_tpu import (
    AssetManager,
    AudioLibrary,
    ConstantPE,
    CropPE,
    GainPE,
    MixPE,
    SinePE,
    print_pe_tree,
)
from pygmu2_tpu.utils.assets import AssetNotFound
from pygmu2_tpu.utils.debug import format_pe_tree, graph_stats
from pygmu2_tpu.utils import wavio


class TestAssetManager:
    def test_cache_hit(self, tmp_path):
        (tmp_path / "kick.wav").write_bytes(b"x")
        mgr = AssetManager(cache_dir=tmp_path)
        assert mgr.load_asset("kick.wav") == tmp_path / "kick.wav"
        assert mgr.has_cached_asset("*.wav")
        assert mgr.list_cached_assets("*.wav") == [tmp_path / "kick.wav"]

    def test_missing_raises(self, tmp_path):
        mgr = AssetManager(cache_dir=tmp_path)
        with pytest.raises(AssetNotFound):
            mgr.load_asset("nope.wav")

    def test_clear_cache(self, tmp_path):
        (tmp_path / "a.bin").write_bytes(b"x")
        mgr = AssetManager(cache_dir=tmp_path)
        mgr.clear_cache()
        assert not mgr.has_cached_asset("*.bin")
        assert mgr.cache_path.exists()


class TestAudioLibrary:
    def test_strudel_json_and_reader(self, tmp_path):
        wav = tmp_path / "snare.wav"
        wavio.write_wav(wav, np.ones(100, np.float32), 44100)
        (tmp_path / "strudel.json").write_text(
            json.dumps({"snare": ["snare.wav"], "kit": ["snare.wav", "snare.wav"]})
        )
        lib = AudioLibrary.from_strudel_json(tmp_path / "strudel.json")
        assert lib.keys == ["kit", "snare"]
        assert lib.resolve("snare") == str(wav)
        assert lib.resolve("kit", 3) == str(wav)  # wraps modulo
        reader = lib.reader("snare")
        assert reader.extent().end == 100

    def test_unknown_name(self, tmp_path):
        (tmp_path / "strudel.json").write_text(json.dumps({"a": ["a.wav"]}))
        lib = AudioLibrary.from_strudel_json(tmp_path / "strudel.json")
        with pytest.raises(KeyError):
            lib.resolve("zzz")


class TestDebug:
    def test_tree_shows_shared_nodes(self):
        base = SinePE(frequency=440.0)
        graph = MixPE(GainPE(base, 0.5), GainPE(base, 0.25))
        text = format_pe_tree(graph)
        assert "MixPE" in text and "SinePE" in text
        assert "<shared:" in text

    def test_graph_stats(self):
        g = CropPE(GainPE(ConstantPE(1.0), 0.5), 0, 100)
        g.render(0, 16)
        stats = graph_stats(g)
        assert stats["n_nodes"] == 3
        assert stats["n_stateful"] == 0
        assert 16 in stats["compiled_block_sizes"]

    def test_print_runs(self, capsys):
        print_pe_tree(ConstantPE(1.0))
        assert "ConstantPE" in capsys.readouterr().out
