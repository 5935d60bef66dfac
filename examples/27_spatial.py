"""Example 27: KEMAR binaural spatialization at three azimuths.

Reference counterpart: examples/27_spatial.py.
"""

from _common import SAMPLE_RATE, finish, pg


def build():
    positions = [(-80.0, 0.0), (0.0, 20.0), (80.0, 0.0)]
    parts = []
    for i, (az, el) in enumerate(positions):
        voice = pg.SlicePE(pg.KarplusStrongPE(196.0 + 50 * i, seed=i), 0, SAMPLE_RATE)
        parts.append(
            (pg.SpatialPE(voice, method=pg.SpatialHRTF(azimuth=az, elevation=el)), i * SAMPLE_RATE)
        )
    graph = pg.SequencePE(parts)
    return graph


if __name__ == "__main__":
    finish(build(), "27_spatial")
