"""Interactive terminal patcher (the reference's Qt patcher window,
``src/signals/ui/patcher/window.py``, re-imagined for a terminal).

A curses application composing the same pieces the Qt window does:
the grid surface (ASCII renderer), the embedded command console wired to
the :class:`~signals_tpu.map.control.Controller` (the reference embeds a
PyQtCmd console, ``window.py:68-82``), dirty tracking via modcount + state
hash (``window.py:217-230``), and keyboard shortcuts for undo/redo.

Run: ``python -m signals_tpu.ui.tui [patch.sigs]``
"""

from __future__ import annotations

import curses
import io
import sys
import typing

from signals_tpu.map.control import Controller
from signals_tpu.ui.ascii import render_map


class PatcherTUI:

    def __init__(self, controller: typing.Optional[Controller] = None):
        self.out = io.StringIO()
        self.controller = controller or Controller(interactive=True,
                                                   stdout=self.out)
        self.history: list[str] = []
        self.hist_pos = 0
        self.line = ''
        self.message = "type commands ('+ 1a signals.chain.osc.Sine', " \
                       "'view', 'undo', 'exit'); F2 undo, F3 redo"
        self.saved_hash = self.controller.hash()

    # --- command handling --------------------------------------------------

    def run_line(self, line: str) -> None:
        if not line.strip():
            return
        self.history.append(line)
        self.hist_pos = len(self.history)
        self.out.truncate(0)
        self.out.seek(0)
        self.controller.default(line)
        self.message = self.out.getvalue().strip() or 'ok'

    @property
    def dirty(self) -> bool:
        return self.controller.hash() != self.saved_hash

    # --- drawing -----------------------------------------------------------

    def draw(self, scr) -> None:
        scr.erase()
        max_y, max_x = scr.getmaxyx()
        title = ' signals_tpu patcher '
        status = f" {'*' if self.dirty else ' '} " \
                 f"mods:{self.controller.modcount} "
        scr.addnstr(0, 0, title.ljust(max_x - len(status)) + status,
                    max_x - 1, curses.A_REVERSE)

        grid = render_map(self.controller.map).splitlines()
        body_rows = max_y - 4
        for i, row in enumerate(grid[:body_rows]):
            scr.addnstr(1 + i, 0, row, max_x - 1)

        msg_lines = self.message.splitlines() or ['']
        scr.addnstr(max_y - 3, 0, msg_lines[-1][:max_x - 1], max_x - 1,
                    curses.A_DIM)
        scr.addnstr(max_y - 2, 0, '-' * (max_x - 1), max_x - 1)
        prompt = f'signals: {self.line}'
        scr.addnstr(max_y - 1, 0, prompt[:max_x - 1], max_x - 1)
        scr.move(max_y - 1, min(len(prompt), max_x - 1))
        scr.refresh()

    # --- main loop ---------------------------------------------------------

    def main(self, scr) -> None:
        curses.use_default_colors()
        scr.keypad(True)
        while not self.controller.exit:
            self.draw(scr)
            ch = scr.get_wch()
            if isinstance(ch, str) and ch.isprintable():
                self.line += ch
            elif ch in ('\n', curses.KEY_ENTER, '\r'):
                line, self.line = self.line, ''
                self.run_line(line)
            elif ch in ('\x7f', '\b', curses.KEY_BACKSPACE):
                self.line = self.line[:-1]
            elif ch == curses.KEY_UP and self.history:
                self.hist_pos = max(0, self.hist_pos - 1)
                self.line = self.history[self.hist_pos]
            elif ch == curses.KEY_DOWN and self.history:
                self.hist_pos = min(len(self.history), self.hist_pos + 1)
                self.line = (self.history[self.hist_pos]
                             if self.hist_pos < len(self.history) else '')
            elif ch == curses.KEY_F2:
                self.run_line('undo')
            elif ch == curses.KEY_F3:
                self.run_line('redo')
            elif ch == '\x03':          # Ctrl-C
                break


def main(argv: typing.Sequence[str] = ()) -> None:
    tui = PatcherTUI()
    if argv:
        tui.run_line(f'load {argv[0]}')
    curses.wrapper(tui.main)


if __name__ == '__main__':
    main(sys.argv[1:])
