"""Live DoA visualizer — twin of micloc/visualizer.py.

Same architecture as the reference: a ring buffer of (time, value) samples
pushed from the compute loop, a separate ``multiprocessing.Process`` running
the matplotlib redraw loop, fed through a Queue (micloc/visualizer.py:24,94-127).
Differences: the queue is an instance attribute instead of a module global
(multiple visualizers can coexist), and a headless mode collects the pushed
samples without spawning a plot process (for tests/CI and benchmark capture).
"""
from __future__ import annotations

import multiprocessing as mp
import time
from typing import Optional

import numpy as np


def _plot_loop(queue: "mp.Queue", waiting_time: float, plot_kwargs: dict):
    import matplotlib

    matplotlib.use(plot_kwargs.pop("backend", "Agg"))
    import matplotlib.pyplot as plt

    figsize = plot_kwargs.pop("figsize", (12, 8))
    xlabel = plot_kwargs.pop("xlabel", "time")
    ylabel = plot_kwargs.pop("ylabel", "value")
    title = plot_kwargs.pop("title", "")
    grid = plot_kwargs.pop("grid", True)

    fig, ax = plt.subplots(figsize=figsize)
    last_data_time = time.time()
    buffer = None
    while True:
        got = False
        try:
            while True:
                item = queue.get_nowait()
                got = True
                if item is None:
                    plt.close(fig)
                    return
                buffer = item
        except Exception:
            pass
        if got:
            last_data_time = time.time()
            ax.clear()
            t_vec, v = buffer
            ax.plot(t_vec, v, ".-")
            ax.set_xlabel(xlabel)
            ax.set_ylabel(ylabel)
            ax.set_title(title)
            ax.grid(grid)
            fig.canvas.draw_idle()
            plt.pause(0.001)
        elif time.time() - last_data_time > waiting_time:
            ax.set_title(f"{title}  [waiting for data ...]")
            plt.pause(0.01)
        else:
            time.sleep(0.01)


class Visualizer:
    """Ring-buffered live plotter (micloc/visualizer.py:27-186)."""

    def __init__(
        self,
        buffer_size: int = 60,
        dim_samples: int = 1,
        waiting_time: float = 2.0,
        headless: bool = False,
    ):
        self.buffer_size = buffer_size
        self.dim_samples = dim_samples
        self.waiting_time = waiting_time
        self.headless = headless

        self._time = np.zeros(buffer_size)
        self._vals = np.full((buffer_size, dim_samples), np.nan)
        self._t0 = time.time()
        self._queue: Optional[mp.Queue] = None
        self._proc: Optional[mp.Process] = None
        self.history = []  # headless capture

    def start(self, **plot_kwargs):
        if self.headless:
            return
        ctx = mp.get_context("spawn")
        self._queue = ctx.Queue()
        self._proc = ctx.Process(
            target=_plot_loop, args=(self._queue, self.waiting_time, plot_kwargs)
        )
        self._proc.daemon = True
        self._proc.start()

    def push(self, value):
        """Shift the ring buffer and enqueue a copy (micloc/visualizer.py:107-127)."""
        value = np.atleast_1d(np.asarray(value, dtype=np.float64))
        self._time = np.roll(self._time, -1)
        self._vals = np.roll(self._vals, -1, axis=0)
        self._time[-1] = time.time() - self._t0
        self._vals[-1] = value
        self.history.append((self._time[-1], value.copy()))
        if self._queue is not None:
            self._queue.put((self._time.copy(), self._vals.copy()))

    def stop(self):
        if self._queue is not None:
            self._queue.put(None)
        if self._proc is not None:
            self._proc.join(timeout=2.0)
            if self._proc.is_alive():
                self._proc.terminate()
            self._proc = None
            self._queue = None
