"""Pipeline presets."""

import numpy as np
import pytest

from audian_tpu.models import PRESETS, get_preset


def test_preset_nodes():
    p = get_preset("bioacoustics")
    names = [n.name for n in p.nodes()]
    assert names == ["filtered", "envelope", "spectrogram"]
    browser = get_preset("browser")
    assert [n.name for n in browser.nodes()] == ["filtered", "spectrogram"]
    with pytest.raises(KeyError):
        get_preset("nope")


def test_preset_fused_matches_interactive(rng):
    """The batch chain and the interactive graph of the same preset agree."""
    import scipy.signal as sps
    from audian_tpu.graph import TraceGraph, TraceSpec, GraphExecutor

    rate = 48000.0
    p = get_preset("bioacoustics")
    x = (0.3 * rng.standard_normal((20000, 2))).astype(np.float32)

    g = TraceGraph(p.nodes())
    g.open(TraceSpec(rate=rate, channels=2, frames=len(x)))
    g["filtered"].update(highpass_cutoff=p.highpass_cutoff,
                         lowpass_cutoff=p.lowpass_cutoff)
    g.refold()
    inter = GraphExecutor(g).run(x, 0, device=False)
    _, want = inter["filtered"]

    fused = p.fused(rate)
    got = np.asarray(fused.filtered_cf(x.T)).T
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_preset_sharded_builds():
    from audian_tpu.parallel import make_mesh

    mesh = make_mesh(seq=8, ch=1)
    pipe = get_preset("browser").sharded(mesh, 48000.0)
    x = np.zeros((1 << 14, 2), np.float32)
    out = pipe(x)
    assert "spectrogram" in out
