"""Multi-recording shell: linked dispatch, CLI parsing, screenshot
navigation, matplotlib frontend (Agg)."""

import numpy as np
import pytest

import matplotlib

matplotlib.use("Agg")

from audian_tpu.app import (Audian, audian_cli, parse_channels,
                            parse_view_metadata, read_png_metadata)
from audian_tpu.analysis import Plugins
from audian_tpu.data import wavio
from audian_tpu.graph import EnvelopeNode


RATE = 44100.0


@pytest.fixture(scope="module")
def wav_files(tmp_path_factory, cricket_like):
    x, rate = cricket_like
    d = tmp_path_factory.mktemp("shell")
    paths = []
    for k in range(2):
        p = d / f"rec{k}.wav"
        wavio.write_audio(p, (0.7 ** k) * x, rate, encoding="PCM_16")
        paths.append(p)
    return paths


@pytest.fixture()
def shell(wav_files):
    plugins = Plugins()
    plugins.add_trace_factory(
        lambda b: b.add_trace(EnvelopeNode("envelope", "filtered")))
    sh = Audian([str(p) for p in wav_files], plugins=plugins)
    sh.load_files()
    yield sh
    sh.close()


def test_load_files_and_failures(wav_files, tmp_path):
    sh = Audian([str(wav_files[0]), str(tmp_path / "missing.wav")])
    sh.load_files()
    assert len(sh) == 1
    assert len(sh.errors) == 1
    assert "missing.wav" in str(sh.errors[0][0])
    sh.close()


def test_linked_time_zoom(shell):
    b0, b1 = shell.browsers
    b0.set_times(0.2, 0.5)
    # zoom is linked by default, scroll is not (`audian.py:54-55`)
    assert b1.twindow == pytest.approx(0.5)
    assert b1.toffset != pytest.approx(0.2)
    shell.link_timescroll = True
    b0.set_times(0.4, 0.25)
    assert b1.toffset == pytest.approx(0.4)
    assert b1.twindow == pytest.approx(0.25)


def test_linked_filter_and_envelope(shell):
    b0, b1 = shell.browsers
    b0.update_filter(highpass_cutoff=3000.0, lowpass_cutoff=9000.0)
    assert b1.data["filtered"].highpass_cutoff == 3000.0
    b0.update_envelope(envelope_cutoff=250.0)
    assert b1.data["envelope"].envelope_cutoff == 250.0
    shell.link_filter = False
    b0.update_filter(highpass_cutoff=1000.0)
    assert b1.data["filtered"].highpass_cutoff == 3000.0


def test_linked_channels_and_audio(shell):
    b0, b1 = shell.browsers
    b0.set_channels([1])
    assert b1.show_channels == [1]
    b0.all_channels()
    b0.set_audio(rate_fac=2.0, use_heterodyne=True, heterodyne_freq=5000.0)
    assert b1.audio_rate_fac == 2.0
    assert b1.audio_use_heterodyne


def test_parse_channels():
    assert parse_channels("0, 2-4, 7") == [0, 2, 3, 4, 7]
    assert parse_channels("") == []


def test_audian_cli_args(wav_files):
    sh = audian_cli(["-c", "0-1", "-f", "2000", "-l", "8000", "-u", "1.5",
                     str(wav_files[0])])
    assert sh.channels == [0, 1]
    assert sh.highpass_cutoff == 2000.0
    assert sh.unwrap == 1.5 and not sh.unwrap_clip
    sh.load_files()
    assert len(sh) == 1
    f = sh.browsers[0].data["filtered"]
    assert f.highpass_cutoff == 2000.0 and f.lowpass_cutoff == 8000.0
    sh.close()


def test_mpl_window_and_screenshot(shell, tmp_path):
    from audian_tpu.gui.mpl import MplBrowserWindow

    b = shell.browsers[0]
    b.set_times(0.25, 0.5)
    win = MplBrowserWindow(b)
    out = tmp_path / "view.png"
    win.savefig(out)
    assert out.exists() and out.stat().st_size > 10000
    # embedded navigation metadata round-trips
    meta = parse_view_metadata(out)
    assert meta["file"].endswith("rec0.wav")
    assert meta["toffset"] == pytest.approx(0.25)
    assert meta["twindow"] == pytest.approx(0.5)
    assert meta["channels"] == [0, 1]
    # key bindings drive the browser
    class Ev:
        key = "x"

    win.on_key(Ev())
    assert b.twindow == pytest.approx(0.25)
    Ev.key = "right"
    win.on_key(Ev())
    assert b.toffset == pytest.approx(0.25 + 0.125)
    win.plt.close(win.fig)


def test_screenshot_restores_view(shell, tmp_path):
    """A saved screenshot passed back as input restores its view
    (`audian.py:232-260` behavior via the audian CLI)."""
    from audian_tpu.gui.mpl import MplBrowserWindow
    from audian_tpu.cli import audian as audian_cli_mod

    b = shell.browsers[0]
    b.set_times(0.6, 0.3)
    win = MplBrowserWindow(b)
    out = tmp_path / "nav.png"
    win.savefig(out)
    win.plt.close(win.fig)
    shot = tmp_path / "shot.png"
    rc = audian_cli_mod.main([str(out), "--screenshot", str(shot)])
    assert rc == 0
    meta = parse_view_metadata(shot)
    assert meta["toffset"] == pytest.approx(0.6)
    assert meta["twindow"] == pytest.approx(0.3)


def test_non_view_png_metadata(tmp_path):
    import matplotlib.pyplot as plt

    fig = plt.figure()
    p = tmp_path / "plain.png"
    fig.savefig(p)
    plt.close(fig)
    assert parse_view_metadata(p) is None
    assert isinstance(read_png_metadata(p), dict)


def test_write_view_metadata_roundtrip(tmp_path):
    """tEXt injection into an existing PNG (the Qt screenshot path)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from audian_tpu.app.screenshot import (write_view_metadata,
                                           parse_view_metadata)

    fig, ax = plt.subplots()
    ax.plot([0, 1], [0, 1])
    p = tmp_path / "shot.png"
    fig.savefig(p)  # plain PNG, no view metadata
    plt.close(fig)
    assert parse_view_metadata(p) is None

    class B:
        class data:
            file_path = "rec.wav"
        toffset = 1.25
        twindow = 0.5
        show_channels = [0, 2]

    write_view_metadata(p, B)
    meta = parse_view_metadata(p)
    assert meta["file"] == "rec.wav"
    assert meta["toffset"] == 1.25 and meta["twindow"] == 0.5
    assert meta["channels"] == [0, 2]


def test_linked_auto_amplitude_preserves_own_ranges(shell):
    """Linked auto-amplitude must leave each browser auto-scaled to ITS
    OWN data: the unguarded echo used to overwrite everyone's ranges
    with the last browser's."""
    a, b = shell.browsers[0], shell.browsers[1]
    shell.set_current(a)
    shell.auto_amplitude()
    ra = a.get_range("x", 0)
    rb = b.get_range("x", 0)
    # recompute each browser's own auto range in isolation
    want_a = dict(zip("ab", ra))
    b2_lo, b2_hi = rb
    shell._dispatch(lambda: (a.auto_ampl("x"), b.auto_ampl("x")))
    assert a.get_range("x", 0) == pytest.approx(ra)
    assert b.get_range("x", 0) == pytest.approx((b2_lo, b2_hi))


def test_late_loaded_browser_syncs_linked_state(wav_files):
    sh = Audian([str(wav_files[0])])
    sh.load_files()
    try:
        a = sh.current
        a.set_times(0.4, 0.3)
        a.set_channels([0])
        a.set_panels(specs=0)
        sh.load_files([str(wav_files[1])])
        b = sh.browsers[1]
        assert b.twindow == pytest.approx(a.twindow)
        assert b.show_channels == [0]
        assert b.show_specs == 0
    finally:
        sh.close()


def test_cli_reports_failures_next_to_successes(wav_files, tmp_path,
                                                capsys):
    from audian_tpu.cli.audian import main

    out = tmp_path / "s.png"
    rc = main([str(wav_files[0]), str(tmp_path / "nope.wav"),
               "--screenshot", str(out)])
    assert rc == 0
    err = capsys.readouterr().err
    assert "nope.wav" in err


def test_cli_pop_option_forms(tmp_path, wav_files):
    from audian_tpu.cli.audian import _pop_option

    argv = ["--screenshot=out.png", "a.wav"]
    assert _pop_option(argv, "--screenshot") == "out.png"
    assert argv == ["a.wav"]
    argv = ["--screenshot", "--mpl", "a.wav"]
    assert _pop_option(argv, "--screenshot") is None  # flag, not a value
    assert "--mpl" in argv
    # a value starting with a single dash is a legitimate filename
    argv = ["--screenshot", "-shot.png", "a.wav"]
    assert _pop_option(argv, "--screenshot") == "-shot.png"
    assert argv == ["a.wav"]
    argv = ["a.wav", "--screenshot"]
    assert _pop_option(argv, "--screenshot") is None
    argv = ["--mpl", "a.wav"]
    assert _pop_option(argv, "--mpl", has_value=False) is True
    assert argv == ["a.wav"]


def test_corrupt_screenshot_argument_does_not_crash(wav_files, tmp_path,
                                                    capsys):
    from audian_tpu.cli.audian import main

    bad = tmp_path / "broken.png"
    bad.write_bytes(b"\x89PNG\r\n\x1a\njunk")
    out = tmp_path / "shot2.png"
    rc = main([str(wav_files[0]), str(bad), "--screenshot", str(out)])
    assert rc == 0  # the good recording still opens
    assert out.exists()


def test_screenshot_restore_does_not_clobber_other_views(wav_files,
                                                         tmp_path):
    """Restoring several screenshots must not fan each view through the
    link dispatch onto the other restored browsers."""
    matplotlib.use("Agg")
    from audian_tpu.cli.audian import main
    from audian_tpu.gui.mpl import MplBrowserWindow
    from audian_tpu.app.screenshot import parse_view_metadata

    shots = []
    for k, (t0, tw) in enumerate([(0.2, 0.4), (0.6, 0.8)]):
        sh = Audian([str(wav_files[k])])
        sh.load_files()
        sh.current.set_times(t0, tw)
        win = MplBrowserWindow(sh.current)
        shot = tmp_path / f"view{k}.png"
        win.savefig(shot)
        win.close()
        sh.close()
        shots.append(shot)
    sh = Audian([])
    sh._pending = [str(s) for s in shots]
    restores = {}
    for k, f in enumerate(list(sh._pending)):
        view = parse_view_metadata(f)
        sh._pending[k] = view["file"]
        restores[str(view["file"])] = view
    sh.load_files()
    try:
        for b in sh.browsers:
            view = restores[str(b.file_path)]
            sh._dispatch(lambda b=b, v=view: b.set_times(v["toffset"],
                                                         v["twindow"]))
        assert sh.browsers[0].twindow == pytest.approx(0.4, abs=1e-4)
        assert sh.browsers[1].twindow == pytest.approx(0.8, abs=1e-4)
    finally:
        sh.close()


def test_unicode_path_screenshot_metadata(tmp_path, rng):
    from audian_tpu.app import DataBrowser
    from audian_tpu.app.screenshot import (write_view_metadata,
                                           parse_view_metadata)

    sub = tmp_path / "récordings–日本"
    sub.mkdir()
    x = (0.2 * rng.standard_normal((8000, 1))).astype(np.float32)
    p = sub / "uni.wav"
    wavio.write_audio(p, x, 8000.0, encoding="PCM_16")
    b = DataBrowser(str(p))
    b.open()
    png = tmp_path / "shot.png"
    # minimal valid PNG (8x8 gray) to inject into
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(1, 1))
    fig.savefig(png)
    plt.close(fig)
    write_view_metadata(png, b)
    view = parse_view_metadata(png)
    assert view is not None
    assert view["file"] == str(p)
    b.close()


def test_cli_preset_installs_chain(wav_files):
    """--preset wires audian_tpu.models.PRESETS into the CLI: trace
    nodes, cutoffs (overridable by -f/-l), and NFFT."""
    sh = audian_cli(["--preset", "bioacoustics", str(wav_files[0])])
    sh.load_files()
    try:
        b = sh.current
        assert "envelope" in b.data          # preset adds the envelope
        f = b.data["filtered"]
        assert f.highpass_cutoff == 2000.0
        # the node stores the requested cutoff; the design clamps to
        # Nyquist internally
        assert f.lowpass_cutoff == 40000.0
        assert b.data["spectrogram"].nfft == 256
    finally:
        sh.close()
    # explicit -f overrides the preset band
    sh = audian_cli(["--preset", "bioacoustics", "-f", "500",
                     str(wav_files[0])])
    sh.load_files()
    try:
        assert sh.current.data["filtered"].highpass_cutoff == 500.0
    finally:
        sh.close()
    with pytest.raises(KeyError, match="unknown preset"):
        audian_cli(["--preset", "nope", str(wav_files[0])])


def test_cli_qt_launch_path_with_fakeqt(wav_files, monkeypatch):
    """The CLI's Qt launch branch (first-file preload, error report,
    warm kickoff, run_qt handoff) executes end-to-end against the fake
    backend — the non-Qt-only part of the coverage gap in
    cli/audian.py (docs/testing.md)."""
    import qtcompat as qtc
    from audian_tpu.cli import audian as cli

    qt, qt_teardown = qtc.setup_backend("fake")
    try:
        seen = {}

        def fake_run_qt(shell):
            # the CLI must hand over a shell with the first recording
            # open and the rest still pending-or-loaded
            seen["browsers"] = len(shell.browsers)
            seen["shell"] = shell
            shell.close()
            return 0

        monkeypatch.setattr(qt, "run_qt", fake_run_qt)
        rc = cli.main([str(wav_files[0]), str(wav_files[1])])
        assert rc == 0
        assert seen["browsers"] >= 1
    finally:
        qt_teardown()


def test_cli_qt_launch_no_openable_files(tmp_path, monkeypatch, capsys):
    import qtcompat as qtc
    from audian_tpu.cli import audian as cli

    qt, qt_teardown = qtc.setup_backend("fake")
    try:
        monkeypatch.setattr(qt, "run_qt",
                            lambda shell: (_ for _ in ()).throw(
                                AssertionError("must not launch")))
        bad = tmp_path / "junk.wav"
        bad.write_bytes(b"not a wav")
        rc = cli.main([str(bad)])
        assert rc == 1
        err = capsys.readouterr().err
        assert "junk.wav" in err and "no recordings" in err
    finally:
        qt_teardown()
