"""Graph structure tests: topo-sort, missing-source error, halo folding,
lazy visibility (SURVEY.md section 4 item 3)."""

import numpy as np
import pytest

from audian_tpu.graph import (
    TraceSpec,
    Node,
    FilterNode,
    EnvelopeNode,
    SpectrogramNode,
    TraceGraph,
    MissingSourceError,
    RAW,
)


def make_spec(rate=48000.0, channels=2, seconds=4.0):
    return TraceSpec(rate=rate, channels=channels,
                     frames=int(rate * seconds), unit="V")


def default_graph():
    # the reference's default chain (plugins.py:11-13): data -> filtered
    # -> {envelope, spectrogram}
    g = TraceGraph()
    g.add(FilterNode("filtered", "data"))
    g.add(EnvelopeNode("envelope", "filtered"))
    g.add(SpectrogramNode("spectrogram", "filtered"))
    return g


def test_topo_order_out_of_order_insert():
    g = TraceGraph()
    g.add(EnvelopeNode("envelope", "filtered"))
    g.add(SpectrogramNode("spectrogram", "filtered"))
    g.add(FilterNode("filtered", "data"))
    names = [n.name for n in g.order]
    assert names.index("filtered") < names.index("envelope")
    assert names.index("filtered") < names.index("spectrogram")


def test_missing_source_raises():
    g = TraceGraph()
    g.add(EnvelopeNode("envelope", "nonexistent"))
    with pytest.raises(MissingSourceError) as ei:
        g.order
    assert "nonexistent" in str(ei.value)
    assert "envelope" in str(ei.value)


def test_duplicate_and_reserved_names():
    g = TraceGraph()
    g.add(FilterNode("filtered", "data"))
    with pytest.raises(ValueError):
        g.add(FilterNode("Filtered", "data"))
    with pytest.raises(ValueError):
        g.add(FilterNode("data", "data"))


def test_dict_access_case_insensitive():
    g = default_graph()
    assert g["FILTERED"] is g["filtered"]
    assert "Envelope" in g
    assert g["nope"] is None
    assert set(g.keys()) == {"filtered", "envelope", "spectrogram"}


def test_remove_trace():
    g = default_graph()
    g.remove("envelope")
    assert "envelope" not in g
    assert len(g) == 2


def test_open_specs():
    g = default_graph()
    spec = make_spec()
    g.open(spec)
    assert g["filtered"].spec.rate == spec.rate
    assert g["filtered"].spec.shape == spec.shape
    sp = g["spectrogram"].spec
    assert sp.rate == spec.rate / 128  # nfft=256, 50% overlap -> hop 128
    assert sp.more_shape == (129,)
    assert sp.unit == "V^2/Hz"
    env = g["envelope"].spec
    assert env.rate == spec.rate


def test_halo_folding_matches_reference_rules():
    """Halos fold backward through the chain to size the raw fetch
    (data.py:154-166 semantics) — here with design-exact halo lengths
    instead of the reference's fixed constants."""
    g = default_graph()
    spec = make_spec()
    tb, ta = g.open(spec)
    env = g["envelope"]
    spect = g["spectrogram"]
    # default filter is pass-through: raw halo comes from envelope and the
    # spectrogram window overhang
    assert env.halo_before > 0
    assert tb == pytest.approx(env.halo_before)
    assert ta == pytest.approx(max(env.halo_after,
                                   (spect.nfft - 1) / spec.rate))
    # activating the filter adds its warm-up in front of everything
    g["filtered"].update(highpass_cutoff=2000.0, lowpass_cutoff=10000.0)
    tb2, ta2 = g.refold()
    f = g["filtered"]
    assert f.halo_before > 0
    assert tb2 == pytest.approx(f.halo_before + env.halo_before)
    # the filter's own output must be extendable by the max of its dests
    nb, na = g.output_halo("filtered")
    assert nb == pytest.approx(env.halo_before)
    assert na == pytest.approx(max(env.halo_after,
                                   (spect.nfft - 1) / spec.rate))


def test_active_set_pulls_ancestors():
    g = default_graph()
    g.open(make_spec())
    active = g.active_set(["envelope"])
    assert active == {"envelope", "filtered", RAW}
    active = g.active_set(["spectrogram", "envelope"])
    assert active == {"spectrogram", "envelope", "filtered", RAW}
    assert g.active_set([RAW]) == {RAW}


def test_spectrogram_update_rules():
    g = default_graph()
    g.open(make_spec())
    node = g["spectrogram"]
    assert node.update(nfft=4) and node.nfft == 8  # clamped up to 8
    node.update(nfft=512, overlap_frac=0.75)
    assert node.nfft == 512 and node.hop == 128
    assert node.update(overlap_frac=2.0) is True  # clamps to 0.99999 -> hop 1
    assert node.hop == 1
    # hop never exceeds nfft
    node.update(overlap_frac=-1.0)
    assert node.hop == node.nfft


def test_filter_update_passthrough_transition():
    g = default_graph()
    g.open(make_spec())
    f = g["filtered"]
    assert f.design is None  # full-band default = pass-through
    f.update(highpass_cutoff=2000.0, lowpass_cutoff=10000.0)
    assert f.design is not None
    assert f.design.sos.shape == (2, 6)
    f.update(highpass_cutoff=0.0, lowpass_cutoff=24000.0)
    assert f.design is None


def test_custom_node_chain_and_rates():
    class Decimator(Node):
        step = 4

        def open(self, source_spec):
            self.source_spec = source_spec
            self.spec = source_spec.decimate(4)
            return self.spec

        def compute(self, source, lead, n_out, params):
            return source[lead : lead + n_out * 4 : 4]

    g = TraceGraph()
    g.add(FilterNode("filtered", "data"))
    g.add(Decimator("coarse", "filtered"))
    g.open(make_spec())
    assert g["coarse"].spec.rate == 12000.0
