"""Plot panels typed by axis specs.

Rebuild of the reference's panel management (`src/audian/panels.py:13-356`):
panels are named plot rows typed by a 2-3 character axis spec drawn from
the alphabets ``t`` (time), ``xyu`` (amplitudes), ``fw`` (frequencies) and
``pq`` (powers); each trace/spectrogram panel gets a *fresh* axis letter so
ranges can be linked per letter across panels and files.

Plot objects ("axes") are duck-typed: anything with ``isVisible``,
``setVisible``, ``add_item``, ``update_plot`` works — the headless tests,
the matplotlib frontend, and Qt/pyqtgraph all plug in here.
"""

from __future__ import annotations

__all__ = ["Panel", "Panels"]


class Panel:
    """One named plot row (`src/audian/panels.py:13-215`)."""

    times = "t"
    amplitudes = "xyu"
    frequencies = "fw"
    powers = "pq"
    spacer = "spacer"

    def __init__(self, name, ax_spec, row):
        self.name = name
        self.ax_spec = ax_spec
        self.row = row
        self.axs = []    # one plot per channel
        self.axcs = []   # associated color bars

    def __str__(self):
        return (f"{self.name:20}: {self.ax_spec:6} @ {self.row:2} "
                f"with {len(self.axs):2} plots")

    def __len__(self):
        return len(self.axs)

    def __eq__(self, ax_spec):
        return self.ax_spec == ax_spec

    def x(self):
        return self.ax_spec[0]

    def y(self):
        return self.ax_spec[1] if len(self.ax_spec) > 1 else ""

    def z(self):
        return self.ax_spec[2] if len(self.ax_spec) > 2 else ""

    # axis-type predicates (`panels.py:55-100`)
    def is_time(self):
        return self.x() in self.times

    def is_xamplitude(self):
        return self.x() in self.amplitudes

    def is_yamplitude(self):
        return self.y() in self.amplitudes

    def is_xfrequency(self):
        return self.x() in self.frequencies

    def is_yfrequency(self):
        return self.y() in self.frequencies

    def is_xpower(self):
        return self.x() in self.powers

    def is_ypower(self):
        return self.y() in self.powers

    def is_zpower(self):
        return bool(self.z()) and self.z() in self.powers

    def is_trace(self):
        return self.is_time() and self.is_yamplitude()

    def is_spectrogram(self):
        return self.is_time() and self.is_yfrequency()

    def is_power(self):
        return self.is_xpower() and self.is_yfrequency()

    def is_spacer(self):
        return self.ax_spec == self.spacer

    # plot wiring ---------------------------------------------------------------

    def add_ax(self, row, ax, axc=None):
        self.row = row
        self.axs.append(ax)
        if axc is not None:
            self.axcs.append(axc)

    def is_used(self):
        return len(self.axs) > 0

    def is_visible(self, channel):
        return self.axs[channel].isVisible()

    def set_visible(self, visible):
        changed = any(ax.isVisible() != visible for ax in self.axs)
        for ax in self.axs:
            ax.setVisible(visible)
        return changed

    def has_visible_traces(self, channel):
        if self.is_spacer():
            return False
        return any(di.isVisible()
                   for di in getattr(self.axs[channel], "data_items", []))

    def has_viewbox(self, viewbox):
        return any(ax.getViewBox() is viewbox for ax in self.axs)

    def show_grid(self, grids):
        if self.is_spacer():
            return
        for ax in self.axs:
            ax.showGrid(x=(grids & 1) > 0, y=(grids & 2) > 0, alpha=0.8)

    def is_cbar_visible(self, channel):
        return self.axcs[channel].isVisible()

    def set_cbar_visible(self, visible):
        changed = any(ax.isVisible() != visible for ax in self.axcs)
        for ax in self.axcs:
            ax.setVisible(visible)
        return changed

    def set_colormap(self, color_map):
        for ax in self.axcs:
            ax.setColorMap(color_map)

    def add_item(self, plot_item, channel=-1, is_data=False):
        if channel >= 0:
            self.axs[channel].add_item(plot_item, is_data)
        else:
            for ax in self.axs:
                ax.add_item(plot_item, is_data)

    def get_amplitude(self, channel, t, x, t1=None):
        if not self.is_yamplitude():
            return t, None
        items = getattr(self.axs[channel], "data_items", [])
        if not items:
            return t, None
        return items[-1].get_amplitude(t, x, t1)

    def get_power(self, channel, t, f):
        if not self.is_yfrequency():
            return None
        items = getattr(self.axs[channel], "data_items", [])
        if not items:
            return None
        return items[0].get_power(t, f)

    def update_plots(self):
        for ax in self.axs:
            if not self.is_spacer() and ax.isVisible():
                ax.update_plot()


class Panels(dict):
    """Ordered registry of panels keyed by name
    (`src/audian/panels.py:218-356`)."""

    def __str__(self):
        return "\n".join(str(p) for p in self.values())

    def add(self, name, axes, row=None, adjust_rows=True):
        if row is None:
            row = self.max_row() + 1
        if adjust_rows:
            for panel in self.values():
                if panel.row >= row:
                    panel.row += 1
        self[name] = Panel(name, axes, row)
        if len(self) > 1:
            ordered = sorted(self.values(), key=lambda p: p.row)
            items = [(p.name, p) for p in ordered]
            self.clear()
            self.update(items)

    def _fresh_letter(self, alphabet, used):
        for letter in alphabet:
            if letter not in used:
                return letter
        return alphabet[0]

    def add_trace(self, name="trace", row=None):
        """Add a time-by-amplitude panel with a fresh amplitude letter
        (`panels.py:247-261`)."""
        used = {p.y() for p in self.values() if p.is_trace()}
        y = self._fresh_letter(Panel.amplitudes, used)
        self.add(name, Panel.times[0] + y, row)

    def add_spectrogram(self, name="spectrogram", row=None):
        """Add a time-by-frequency(+power) panel plus its side power panel
        with fresh frequency/power letters (`panels.py:264-279`)."""
        used_f = {p.y() for p in self.values() if p.is_spectrogram()}
        used_p = {p.z() for p in self.values() if p.is_spectrogram()}
        f = self._fresh_letter(Panel.frequencies, used_f)
        p = self._fresh_letter(Panel.powers, used_p)
        spec = Panel.times[0] + f + p
        self.add(name, spec, row)
        self.add(name + "-power", p + f, self[name].row, False)

    def fill(self, data):
        """Auto-create panels for plugin traces (`panels.py:282-288`)."""
        for trace in data.traces:
            panel = getattr(trace, "panel", None)
            if panel and panel not in self:
                if getattr(trace, "panel_type", "trace") == "spectrogram":
                    self.add_spectrogram(panel)
                else:
                    self.add_trace(panel)

    def remove(self, name):
        del self[name]

    def max_row(self):
        return max((p.row for p in self.values()), default=-1)

    def add_power_ax(self, name, row, ax):
        name = name + "-power"
        if name in self:
            self[name].add_ax(row, ax)

    def get_panel(self, viewbox):
        for panel in self.values():
            if panel.has_viewbox(viewbox):
                return panel
        return None

    def show_grid(self, grids):
        for panel in self.values():
            panel.show_grid(grids)

    def update_plots(self):
        for panel in self.values():
            panel.update_plots()

    def insert_spacers(self):
        """Interleave spacer rows between panel groups
        (`panels.py:325-341`)."""
        items = []
        spacer = 0
        for row, (name, panel) in enumerate(self.items()):
            if row > 0 and not panel.is_power():
                sname = f"spacer{spacer}"
                items.append((sname, Panel(sname, Panel.spacer, 0)))
                spacer += 1
            items.append((name, panel))
        self.clear()
        self.update(items)

    def show_spacers(self, channel):
        """Spacers show only between visible panels (`panels.py:344-356`)."""
        prev_panel = None
        prev_spacer = None
        panel = None
        for panel in self.values():
            if panel.is_spacer():
                if prev_panel is not None:
                    visible = prev_panel.is_visible(channel)
                    panel.set_visible(visible)
                    if visible:
                        prev_spacer = panel
            elif not panel.is_power():
                prev_panel = panel
                if panel.is_visible(channel):
                    prev_spacer = None
        if prev_spacer is not None and panel is not None:
            panel.set_visible(False)
