"""Nested console + file logger with aligned tables.

Re-design of ``/root/reference/src/ui/log.jl``: sectioned, indented logging
mirrored to a file, with auto-width tables for loss/benchmark reporting.
ANSI styling is kept minimal (no external deps).
"""

from __future__ import annotations

import contextlib
import sys
from typing import IO, List, Optional, Sequence

BOLD = "\033[1m"
DIM = "\033[2m"
RED = "\033[31m"
GREEN = "\033[32m"
YELLOW = "\033[33m"
CYAN = "\033[36m"
RESET = "\033[0m"

INDENT = 2


class Logger:
    """(``src/ui/log.jl:32-43``)"""

    def __init__(self, console: Optional[IO] = None,
                 logfile: Optional[str] = None, use_color: bool = True):
        self.console = console if console is not None else sys.stdout
        self.file = open(logfile, "a") if logfile else None
        self.level = 0
        self.use_color = use_color and hasattr(self.console, "isatty") and \
            self.console.isatty()

    def _style(self, text: str, *codes: str) -> str:
        if not self.use_color or not codes:
            return text
        return "".join(codes) + text + RESET

    def print(self, text: str = "", *codes: str):
        pad = " " * (INDENT * self.level)
        for line in text.split("\n"):
            self.console.write(pad + self._style(line, *codes) + "\n")
            if self.file:
                self.file.write(pad + line + "\n")
        self.console.flush()
        if self.file:
            self.file.flush()

    @contextlib.contextmanager
    def section(self, title: str):
        """(``src/ui/log.jl:82-88``)"""
        self.print("")
        self.print(title, BOLD, CYAN)
        self.print("")
        self.level += 1
        try:
            yield
        finally:
            self.level -= 1

    def table(self, headers: Sequence[str], rows: Sequence[Sequence],
              highlight: Optional[Sequence[bool]] = None):
        """Auto-width table (``src/ui/log.jl:118-189``)."""
        def fmt(x):
            if isinstance(x, float):
                return f"{x:.4f}" if abs(x) < 1e4 else f"{x:.3e}"
            return str(x)

        cells = [[fmt(x) for x in row] for row in rows]
        widths = [max(len(h), *(len(r[i]) for r in cells)) if cells
                  else len(h) for i, h in enumerate(headers)]
        head = "  ".join(h.rjust(w) for h, w in zip(headers, widths))
        self.print(head, BOLD)
        for j, row in enumerate(cells):
            line = "  ".join(c.rjust(w) for c, w in zip(row, widths))
            hl = highlight[j] if highlight else False
            self.print(line, *( [GREEN] if hl else [] ))

    def close(self):
        if self.file:
            self.file.close()
