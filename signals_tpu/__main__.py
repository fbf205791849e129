"""Package entry: the headless patcher REPL
(reference ``src/signals/__main__.py`` starts the Qt GUI; the durable
interface here is the REPL — see SURVEY §7 build order)."""

import faulthandler
import sys

import signals_tpu.map.control

if __name__ == '__main__':
    faulthandler.enable()
    signals_tpu.map.control.main(sys.argv[1:])
