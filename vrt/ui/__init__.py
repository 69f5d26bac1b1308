from vrt.ui.window import (HeadlessWindow, InputEvents, Key,  # noqa: F401
                           new_window)
