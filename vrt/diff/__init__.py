from vrt.diff.fit import (fit, graft_params, make_fit_step,  # noqa: F401
                          rebuild_accel, render_views)
