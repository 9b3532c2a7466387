"""Shared axis ranges across panels and channels.

Rebuild of `src/audian/plotranges.py:15-666`: one ``PlotRange`` per axis
letter (see :class:`audian_tpu.view.panels.Panel` alphabets) holds the
per-channel ``[r0, r1]`` view ranges, the global limits, and the full
zoom/pan/step/auto/home/end/snap verb set; ``PlotRanges`` links them so
"zoom amplitude" acts on every panel and file sharing that letter.  The
crosshair and stored-marker positions with their delta readouts live here
too.

Axes are duck-typed (``range(axspec)``, ``setXRange``/``setYRange``/
``setZRange``, ``setLimits``, ``amplitudes(t0, t1)``), so the same logic
drives headless tests and any GUI frontend.
"""

from __future__ import annotations

from math import ceil, log

import numpy as np

from .panels import Panel

__all__ = ["PlotRange", "PlotRanges"]

#: verbs PlotRanges forwards to every axis letter in an axspec string
VERBS = [
    "zoom_in", "zoom_out", "zoom_in_centered", "zoom_out_centered",
    "down", "up", "small_down", "small_up", "step_down", "step_up",
    "min_down", "min_up", "max_down", "max_up", "home", "end", "snap",
    "auto", "reset", "center",
]


class PlotRange:
    """Range state of one axis letter (`plotranges.py:15-531`)."""

    def __init__(self, axspec, nchannels):
        self.axspec = axspec
        self.rmin = None
        self.rmax = None
        self.rstep = None
        self.min_dr = None
        self.r0 = [None] * nchannels
        self.r1 = [None] * nchannels
        self.axxs = [[] for _ in range(nchannels)]
        self.axys = [[] for _ in range(nchannels)]
        self.axzs = [[] for _ in range(nchannels)]
        self.marker_channel = None
        self.marker_ax = None
        self.marker_pos = None
        self.stored_marker_channel = None
        self.stored_marker_ax = None
        self.stored_marker_pos = None

    def __str__(self):
        def fmt(v):
            return f'{"-":>8}' if v is None else f"{v:8.5g}"

        return (f"{self.axspec}: rmin={fmt(self.rmin)} rmax={fmt(self.rmax)}"
                f" rstep={fmt(self.rstep)} min_dr={fmt(self.min_dr)}"
                f" r0={fmt(self.r0[0])} r1={fmt(self.r1[0])}")

    # -- wiring -------------------------------------------------------------------

    def _absorb_limits(self, ax):
        rmin, rmax, rstep = ax.range(self.axspec)
        if rmin is not None and (self.rmin is None or rmin < self.rmin):
            self.rmin = rmin
        if rmax is not None and (self.rmax is None or rmax > self.rmax):
            self.rmax = rmax
        if rstep is not None and (self.rstep is None or rstep < self.rstep):
            self.rstep = rstep

    def add_xaxis(self, ax, channel):
        self._absorb_limits(ax)
        self.axxs[channel].append(ax)

    def add_yaxis(self, ax, channel):
        self._absorb_limits(ax)
        self.axys[channel].append(ax)

    def add_zaxis(self, ax, channel):
        self._absorb_limits(ax)
        self.axzs[channel].append(ax)

    def is_used(self):
        return any(len(a) for a in self.axxs + self.axys + self.axzs)

    def is_time(self):
        return self.axspec in Panel.times

    def is_amplitude(self):
        return self.axspec in Panel.amplitudes

    def is_frequency(self):
        return self.axspec in Panel.frequencies

    def is_power(self):
        return self.axspec in Panel.powers

    def set_starttime(self, mode):
        for axx in self.axxs:
            for ax in axx:
                ax.set_starttime(mode)

    def at_end(self, channel=0):
        return self.rmax is not None and self.r1[channel] >= self.rmax

    def at_home(self, channel=0):
        return self.rmin is None or self.r0[channel] <= self.rmin

    # -- limits ------------------------------------------------------------------

    def _lo(self):
        return -np.inf if self.rmin is None else self.rmin

    def _hi(self):
        return np.inf if self.rmax is None else self.rmax

    def set_limits(self):
        """Derive smallest zoom step and push limits into the axes; init
        ranges (`plotranges.py:111-151`)."""
        if not self.is_used():
            return

        def fin(v):  # None-safe: axes without data report None limits
            return v is not None and np.isfinite(v)

        if fin(self.rmin) and fin(self.rmax):
            self.min_dr = 0.001 if self.is_time() else \
                (self.rmax - self.rmin) / 2 ** 16
        else:
            self.min_dr = 2 / 2 ** 16
        for c, axx in enumerate(self.axxs):
            for ax in axx:
                kw = {}
                if fin(self.rmin):
                    kw["xMin"] = self.rmin
                if fin(self.rmax):
                    kw["xMax"] = self.rmax
                    if fin(self.rmin):
                        kw["minXRange"] = self.min_dr
                        kw["maxXRange"] = self.rmax - self.rmin
                ax.setLimits(**kw)
        for axy in self.axys:
            for ax in axy:
                kw = {}
                if fin(self.rmin):
                    kw["yMin"] = self.rmin
                if fin(self.rmax):
                    kw["yMax"] = self.rmax
                    if fin(self.rmin):
                        kw["minYRange"] = self.min_dr
                        kw["maxYRange"] = self.rmax - self.rmin
                ax.setLimits(**kw)
        for c in range(len(self.r0)):
            self.r0[c] = self.rmin if fin(self.rmin) else -1
            r1 = 10 if self.is_time() else self.rmax
            self.r1[c] = r1 if fin(r1) else +1

    # -- core range setter ----------------------------------------------------------

    def _channel_list(self, channels):
        """Time ranges are shared across channels (`plotranges.py:158-160`)."""
        if channels is None or self.is_time():
            return list(range(len(self.r0)))
        return list(channels)

    def set_ranges(self, r0=None, r1=None, dr=None, channels=None,
                   do_set=True):
        """Set [r0, r1] (or a width ``dr``) on the given channels, clamped
        to the limits; time ranges replicate the first updated channel
        (`plotranges.py:153-194`)."""
        if not self.is_used():
            return
        channels = self._channel_list(channels)
        lead = -1
        for c in channels:
            if not (self.axxs[c] or self.axys[c] or self.axzs[c]):
                continue
            if lead >= 0:
                self.r0[c] = self.r0[lead]
                self.r1[c] = self.r1[lead]
            else:
                if r0 is not None:
                    self.r0[c] = r0
                if r1 is not None:
                    self.r1[c] = r1
                if dr is not None:
                    if r1 is None:
                        self.r1[c] = self.r0[c] + dr
                    else:
                        self.r0[c] = self.r1[c] - dr
                width = self.r1[c] - self.r0[c]
                if self.rmin is not None and self.r0[c] < self.rmin:
                    self.r0[c] = self.rmin
                    self.r1[c] = self.rmin + width
                if (self.rmax is not None and self.r1[c] > self.rmax
                        and not self.is_time()):
                    self.r1[c] = self.rmax
                    self.r0[c] = self.rmax - width
                if self.rmin is not None and self.r0[c] < self.rmin:
                    self.r0[c] = self.rmin
                if self.is_time():
                    lead = c
            if do_set:
                for ax in self.axxs[c]:
                    ax.setXRange(self.r0[c], self.r1[c])
                for ax in self.axys[c]:
                    ax.setYRange(self.r0[c], self.r1[c])
                for ax in self.axzs[c]:
                    ax.setZRange(self.r0[c], self.r1[c])

    # -- verbs -----------------------------------------------------------------------

    def _each(self, channels):
        if not self.is_used():
            return []
        channels = self._channel_list(channels)
        return [0] if self.is_time() and channels else channels

    def zoom_in(self, channels=None, do_set=True):
        """Halve the range: around the center for signed axes, from r0 for
        positive axes (`plotranges.py:197-213`)."""
        for c in self._each(channels):
            width = self.r1[c] - self.r0[c]
            if self.rmin is not None and self.rmin < 0:
                if width > self.min_dr:
                    m = 0.5 * (self.r1[c] + self.r0[c])
                    self.set_ranges(m - width / 4, m + width / 4, None,
                                    [c], do_set)
            elif width > self.min_dr:
                self.set_ranges(self.r0[c], None, width / 2, [c], do_set)

    def zoom_out(self, channels=None, do_set=True):
        for c in self._each(channels):
            width = self.r1[c] - self.r0[c]
            if self.rmin is not None and self.rmin < 0:
                m = 0.5 * (self.r1[c] + self.r0[c])
                self.set_ranges(m - width, m + width, None, [c], do_set)
            else:
                self.set_ranges(self.r0[c], None, 2 * width, [c], do_set)

    def zoom_in_centered(self, channels=None, do_set=True):
        for c in self._each(channels):
            width = self.r1[c] - self.r0[c]
            if width > self.min_dr:
                m = 0.5 * (self.r1[c] + self.r0[c])
                self.set_ranges(m - width / 4, m + width / 4, None, [c],
                                do_set)

    def zoom_out_centered(self, channels=None, do_set=True):
        for c in self._each(channels):
            width = self.r1[c] - self.r0[c]
            m = 0.5 * (self.r1[c] + self.r0[c])
            self.set_ranges(m - width, m + width, None, [c], do_set)

    def goto(self, pos, channels=None, do_set=True):
        for c in self._each(channels):
            if self.r0[c] != pos:
                self.set_ranges(pos, pos + (self.r1[c] - self.r0[c]), None,
                                [c], do_set)

    def move(self, move_fac, channels=None, do_set=True):
        """Pan by a fraction of the current width (`plotranges.py:273-287`)."""
        for c in self._each(channels):
            if (move_fac > 0 and self.r1[c] < self._hi()) or \
               (move_fac < 0 and self.r0[c] > self._lo()):
                width = self.r1[c] - self.r0[c]
                self.set_ranges(self.r0[c] + move_fac * width,
                                self.r1[c] + move_fac * width, None, [c],
                                do_set)

    def down(self, channels=None, do_set=True):
        self.move(-0.5, channels, do_set)

    def up(self, channels=None, do_set=True):
        self.move(+0.5, channels, do_set)

    def small_down(self, channels=None, do_set=True):
        self.move(-0.05, channels, do_set)

    def small_up(self, channels=None, do_set=True):
        self.move(+0.05, channels, do_set)

    def step(self, step_fac, channels=None, do_set=True):
        """Pan by the data-derived step (`plotranges.py:306-319`)."""
        if self.rstep is None:
            return
        for c in self._each(channels):
            if (step_fac > 0 and self.r1[c] < self._hi()) or \
               (step_fac < 0 and self.r0[c] > self._lo()):
                self.set_ranges(self.r0[c] + step_fac * self.rstep,
                                self.r1[c] + step_fac * self.rstep, None,
                                [c], do_set)

    def step_down(self, channels=None, do_set=True):
        self.step(-1, channels, do_set)

    def step_up(self, channels=None, do_set=True):
        self.step(+1, channels, do_set)

    def min_step(self, step_fac, channels=None, do_set=True):
        """Move only the lower edge (`plotranges.py:330-343`)."""
        if self.rstep is None:
            return
        for c in self._each(channels):
            if (step_fac > 0 and self.r0[c] < self.r1[c]) or \
               (step_fac < 0 and self.r0[c] > self._lo()):
                self.set_ranges(self.r0[c] + step_fac * self.rstep,
                                self.r1[c], None, [c], do_set)

    def min_down(self, channels=None, do_set=True):
        self.min_step(-1, channels, do_set)

    def min_up(self, channels=None, do_set=True):
        self.min_step(+1, channels, do_set)

    def max_step(self, step_fac, channels=None, do_set=True):
        """Move only the upper edge (`plotranges.py:354-367`)."""
        if self.rstep is None:
            return
        for c in self._each(channels):
            if (step_fac > 0 and self.r1[c] < self._hi()) or \
               (step_fac < 0 and self.r1[c] > self.r0[c]):
                self.set_ranges(self.r0[c],
                                self.r1[c] + step_fac * self.rstep, None,
                                [c], do_set)

    def max_down(self, channels=None, do_set=True):
        self.max_step(-1, channels, do_set)

    def max_up(self, channels=None, do_set=True):
        self.max_step(+1, channels, do_set)

    def home(self, channels=None, do_set=True):
        if self.rmin is None:
            return
        for c in self._each(channels):
            if self.r0[c] > self.rmin:
                self.set_ranges(self.rmin, None,
                                self.r1[c] - self.r0[c], [c], do_set)

    def end(self, channels=None, do_set=True):
        """Jump to the end, aligned to half-width steps
        (`plotranges.py:394-407`)."""
        if self.rmax is None:
            return
        for c in self._each(channels):
            if self.r1[c] < self.rmax:
                width = self.r1[c] - self.r0[c]
                r1 = ceil(self.rmax / (0.5 * width)) * (0.5 * width)
                self.set_ranges(None, r1, width, [c], do_set)

    def snap(self, channels=None, do_set=True):
        """Snap width to 10*2^k and the offset to half-width multiples
        (`plotranges.py:420-429`)."""
        for c in self._each(channels):
            width = self.r1[c] - self.r0[c]
            width = 10 * 2 ** round(log(width / 10) / log(2))
            r0 = round(self.r0[c] / (width / 2)) * (width / 2)
            self.set_ranges(r0, None, width, [c], do_set)

    def auto(self, t0, t1, channels=None, do_set=True):
        """Auto-scale to the data extrema in [t0, t1]
        (`plotranges.py:432-448`)."""
        if not self.is_used() or self.is_time():
            return
        if channels is None:
            channels = range(len(self.r0))
        rmin = rmax = None
        for c in channels:
            for ax in self.axxs[c] + self.axys[c]:
                a0, a1 = ax.amplitudes(t0, t1)
                rmin = a0 if rmin is None or a0 < rmin else rmin
                rmax = a1 if rmax is None or a1 > rmax else rmax
        self.set_ranges(rmin, rmax, None, channels, do_set)

    def reset(self, channels=None, do_set=True):
        if not self.is_used():
            return
        rmin = (self.rmin if self.rmin is not None
                and np.isfinite(self.rmin) else -1)
        rmax = (self.rmax if self.rmax is not None
                and np.isfinite(self.rmax) else +1)
        self.set_ranges(rmin, rmax, None, channels, do_set)

    def center(self, channels=None, do_set=True):
        """Symmetrize the range around zero (`plotranges.py:461-467`)."""
        if not self.is_used() or self.is_time():
            return
        if channels is None:
            channels = range(len(self.r0))
        for c in channels:
            r = max(abs(self.r0[c]), abs(self.r1[c]))
            self.set_ranges(-r, +r, None, [c], do_set)

    def set_powers(self):
        """Noise-floor based auto color levels across all spectrogram
        items on this power axis (`plotranges.py:461-478`)."""
        if not self.is_power() or not self.is_used():
            return
        zmin = zmax = None
        for c, axz in enumerate(self.axzs):
            for ax in axz:
                for item in getattr(ax, "data_items", []):
                    estimate = getattr(
                        getattr(item, "data", None), "estimate_noiselevels",
                        None)
                    if estimate is None:
                        continue
                    z0, z1 = estimate(c)
                    if z0 is None or z1 is None:
                        continue
                    zmin = z0 if zmin is None or z0 < zmin else zmin
                    zmax = z1 if zmax is None or z1 > zmax else zmax
        if zmin is not None and zmax is not None:
            self.set_ranges(zmin, zmax)

    # -- markers -----------------------------------------------------------------

    def clear_marker(self):
        self.marker_channel = None
        self.marker_ax = None
        self.marker_pos = None

    def set_marker(self, channel, ax, pos):
        self.marker_channel = channel
        self.marker_ax = ax
        self.marker_pos = pos

    def store_marker(self):
        """Freeze the current crosshair as the stored marker; returns the
        axis plus its x/y role (`plotranges.py:493-505`)."""
        self.stored_marker_channel = self.marker_channel
        self.stored_marker_ax = self.marker_ax
        self.stored_marker_pos = self.marker_pos
        if self.stored_marker_channel is None:
            return None, None, None
        if self.stored_marker_ax in self.axxs[self.stored_marker_channel]:
            return self.stored_marker_ax, self.stored_marker_pos, None
        if self.stored_marker_ax in self.axys[self.stored_marker_channel]:
            return self.stored_marker_ax, None, self.stored_marker_pos
        return None, None, None

    def clear_stored_marker(self):
        for axs in self.axxs + self.axys:
            for ax in axs:
                marker = getattr(ax, "stored_marker", None)
                if marker is not None:
                    marker.setVisible(False)
        self.stored_marker_channel = None
        self.stored_marker_ax = None
        self.stored_marker_pos = None

    def update_crosshair(self):
        for axx in self.axxs:
            for ax in axx:
                if self.marker_pos is not None:
                    ax.xline.setPos(self.marker_pos)
                ax.xline.setVisible(self.marker_pos is not None)
        for axy in self.axys:
            for ax in axy:
                if self.marker_pos is not None:
                    ax.yline.setPos(self.marker_pos)
                ax.yline.setVisible(self.marker_pos is not None)


class PlotRanges(dict):
    """All PlotRange objects keyed by axis letter, plus verb dispatch to
    axspec strings (`plotranges.py:534-666`)."""

    def setup(self, nchannels):
        for s in (Panel.times + Panel.amplitudes + Panel.frequencies
                  + Panel.powers):
            self[s] = PlotRange(s, nchannels)

    def add_plot(self, ax):
        self[ax.x()].add_xaxis(ax, ax.channel)
        self[ax.y()].add_yaxis(ax, ax.channel)
        if ax.z():
            self[ax.z()].add_zaxis(ax, ax.channel)

    def set_limits(self):
        for r in self.values():
            r.set_limits()

    def set_ranges(self):
        for r in self.values():
            r.set_ranges()

    def set_powers(self):
        for r in self.values():
            r.set_powers()

    def __getattr__(self, verb):
        """Verb dispatch: ``ranges.zoom_in('xy', ...)`` forwards to every
        letter of the axspec string."""
        if verb not in VERBS:
            raise AttributeError(verb)

        def apply(axspec, *args, **kwargs):
            for s in axspec:
                getattr(self[s], verb)(*args, **kwargs)

        return apply

    # -- markers -------------------------------------------------------------------

    def clear_marker(self):
        for r in self.values():
            r.clear_marker()

    def store_marker(self):
        axm = xpos = ypos = None
        for r in self.values():
            r.clear_stored_marker()
            ax, x, y = r.store_marker()
            if ax is None:
                continue
            if axm is None:
                axm, xpos, ypos = ax, x, y
            elif axm is ax:
                xpos = x if xpos is None else xpos
                ypos = y if ypos is None else ypos
        if axm is not None and xpos is not None and ypos is not None:
            axm.set_stored_marker(xpos, ypos)

    def clear_stored_marker(self):
        for r in self.values():
            r.clear_stored_marker()

    def _marker_pos(self, letters):
        for s in letters:
            if self[s].marker_pos is not None:
                return s, self[s].marker_pos
        return None, None

    def marker_time(self):
        return self._marker_pos(Panel.times)

    def marker_amplitude(self):
        return self._marker_pos(Panel.amplitudes)

    def marker_frequency(self):
        return self._marker_pos(Panel.frequencies)

    def marker_power(self):
        return self._marker_pos(Panel.powers)

    def _marker_delta(self, letters):
        for s in letters:
            r = self[s]
            if r.marker_pos is not None and r.stored_marker_pos is not None:
                return s, r.marker_pos - r.stored_marker_pos
        return None, None

    def marker_delta_time(self):
        return self._marker_delta(Panel.times)

    def marker_delta_amplitude(self):
        return self._marker_delta(Panel.amplitudes)

    def marker_delta_frequency(self):
        return self._marker_delta(Panel.frequencies)

    def marker_delta_power(self):
        return self._marker_delta(Panel.powers)

    def update_crosshair(self):
        for r in self.values():
            r.update_crosshair()
