"""Randomized DAG-shape fuzzing of the chunk-equivalence property.

`tests/test_chunk_equivalence.py` pins chunked == whole for the standard
filter -> {envelope, spectrogram} chain.  Real sessions build arbitrary
plugin DAGs: stacked filters, envelopes of envelopes, rate-changing
plugin nodes mid-chain, spectrograms hanging off any branch.  This
fuzzer generates random graphs (random topology, parameters, rates,
channel counts) and asserts that halo-overlapped chunked execution
equals whole-recording execution for EVERY trace — the load-bearing
invariant behind `TraceGraph.refold()` on shapes nobody hand-wrote.
"""

import numpy as np
import pytest

from audian_tpu.graph import (
    TraceSpec,
    Node,
    FilterNode,
    EnvelopeNode,
    SpectrogramNode,
    TraceGraph,
    GraphExecutor,
)


class Decimator(Node):
    """Rate-changing plugin node (the test_graph custom-node pattern)."""

    def __init__(self, name, source, step):
        super().__init__(name, source)
        self.step = step

    def open(self, source_spec):
        self.source_spec = source_spec
        self.spec = source_spec.decimate(self.step)
        return self.spec

    def compute(self, source, lead, n_out, params):
        return source[lead : lead + n_out * self.step : self.step]


def _random_graph(rng, rate, channels, frames):
    """Random DAG over 'data'; returns (graph, names of derived traces)."""
    g = TraceGraph()
    # time-series candidates a new node may source, with their rates
    series = [("data", rate)]
    n_series = int(rng.integers(1, 5))
    for i in range(n_series):
        src, src_rate = series[int(rng.integers(0, len(series)))]
        kind = int(rng.integers(0, 3))
        name = f"n{i}"
        if kind == 0:
            node = FilterNode(name, src)
            g.add(node)
            series.append((name, src_rate))
        elif kind == 1:
            cutoff = float(rng.uniform(0.01, 0.1)) * src_rate
            g.add(EnvelopeNode(name, src, envelope_cutoff=cutoff))
            series.append((name, src_rate))
        else:
            step = int(rng.choice([2, 3, 4]))
            g.add(Decimator(name, src, step))
            series.append((name, src_rate / step))
    for j in range(int(rng.integers(0, 3))):
        src, src_rate = series[int(rng.integers(0, len(series)))]
        g.add(SpectrogramNode(
            f"s{j}", src,
            nfft=int(rng.choice([64, 128, 256])),
            overlap_frac=float(rng.choice([0.25, 0.5, 0.75]))))
    g.open(TraceSpec(rate=rate, channels=channels, frames=frames))
    # randomize filter cutoffs after open (defaults are set on first open)
    for name, src_rate in series[1:]:
        node = g[name]
        if isinstance(node, FilterNode):
            hp = (0.0 if rng.random() < 0.3
                  else float(rng.uniform(0.01, 0.2)) * src_rate)
            lp = (src_rate / 2 if rng.random() < 0.3
                  else float(rng.uniform(0.25, 0.45)) * src_rate)
            node.update(highpass_cutoff=hp, lowpass_cutoff=lp)
    g.refold()
    return g


def _run_chunked(g, x, rate, chunk):
    """Chunked + halo execution, stitched (the harness of
    tests/test_chunk_equivalence.py, parameterized by rate)."""
    ex = GraphExecutor(g)
    tb, ta = g.raw_halo
    hb = int(np.ceil(tb * rate))
    ha = int(np.ceil(ta * rate))
    n = x.shape[0]
    results = {}
    for start in range(0, n, chunk):
        stop = min(start + chunk, n)
        r0 = max(start - hb, 0)
        r1 = min(stop + ha, n)
        out = ex.run(x[r0:r1], r0, device=False)
        for name, (off, arr) in out.items():
            dst = results.setdefault(name, {})
            for i in range(arr.shape[0]):
                a = off + i
                if name != "data" and a in dst:
                    continue
                dst.setdefault(a, arr[i])
    stitched = {}
    for name, frames in results.items():
        idx = sorted(frames)
        stitched[name] = (idx[0], np.stack([frames[i] for i in idx]))
    return stitched


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_graph_chunked_equals_whole(rng, seed):
    r = np.random.default_rng(1000 + seed)
    rate = float(r.choice([8000.0, 16000.0]))
    channels = int(r.integers(1, 4))
    frames = int(float(r.uniform(1.0, 2.0)) * rate)
    t = np.arange(frames) / rate
    am = (np.sin(2 * np.pi * 3.0 * t) > 0).astype(float)
    x = np.stack([0.5 * np.sin(2 * np.pi * (0.05 + 0.03 * c) * rate * t)
                  * am + 0.02 * rng.standard_normal(frames)
                  for c in range(channels)], axis=1)

    g = _random_graph(r, rate, channels, frames)
    derived = [n.name for n in g.order]
    assert derived, "graph should have at least one derived trace"

    whole = GraphExecutor(g).run(x, 0, device=False)
    chunk = int(r.integers(1500, 9000))
    chunked = _run_chunked(g, x, rate, chunk)

    for name in ["data"] + derived:
        off_w, arr_w = whole[name]
        off_c, arr_c = chunked[name]
        assert off_c == off_w, (name, off_c, off_w)
        assert arr_c.shape == arr_w.shape, \
            (name, arr_c.shape, arr_w.shape, "chunk", chunk)
        np.testing.assert_allclose(
            arr_c, arr_w, atol=1e-6,
            err_msg=f"seed {seed}: trace {name!r} (chunk={chunk}) "
                    f"chunked != whole")
