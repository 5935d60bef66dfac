"""Example: AssetManager — cached asset resolution with remote loaders.

The reference demonstrates GitHub/GoogleDrive loaders; this environment
has no network, so the demo exercises the cache layer (locate, list,
load from cache) with locally synthesized assets. The loader classes
(``GithubUserContentAssetLoader``, ``GoogleDriveAssetLoader``) plug
into the same AssetManager given connectivity.
Reference counterpart: examples/demo_asset_manager.py.
"""

import shutil
from pathlib import Path

from _common import finish, make_drum_wav, pg


def build():
    cache = Path("/tmp/pygmu2_tpu_asset_cache")
    cache.mkdir(exist_ok=True)
    am = pg.AssetManager(loaders=[], cache_dir=cache)

    # drop an asset into the cache (a remote loader would do this)
    wav = make_drum_wav()
    shutil.copy(wav, cache / "hit.wav")

    print("cached?", am.has_cached_asset("hit.wav"))
    print("cached matches:", [p.name for p in am.list_cached_assets("*.wav")])
    path = am.load_asset("hit.wav")
    print("resolved:", path)
    return pg.WavReaderPE(str(path))


if __name__ == "__main__":
    finish(build(), "demo_asset_manager")
