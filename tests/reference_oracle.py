"""Load the reference numpy engine from /root/reference as a parity oracle.

The reference pins ~2020 library versions (SURVEY.md §2.5): it uses the
removed ``np.int`` alias, the removed ``scipy.ndimage.measurements``
namespace, and imports classic ``gym`` in its package __init__.  We load the
``govars``/``state_utils``/``gogame`` modules directly (bypassing the
package __init__, which would pull in gym/pyglet) with compat shims.

The oracle is used read-only, purely as ground truth in tests.
"""

from __future__ import annotations

import sys
import types

import numpy as np

REFERENCE_PATH = "/root/reference/gym_go"


def load_reference_gogame():
    """Returns the reference ``gogame`` module (cached after first load).

    Guard: the repo ships a ``gym_go`` *compatibility shim* backed by
    gymgo_tpu.  The oracle must always be the code under /root/reference —
    comparing the engine against its own shim would make parity tests
    vacuous — so any previously imported non-reference gym_go is evicted.
    """
    existing = sys.modules.get("gym_go.gogame")
    if existing is not None:
        if REFERENCE_PATH in (getattr(existing, "__file__", "") or ""):
            return existing
        for name in [m for m in sys.modules if m.split(".")[0] == "gym_go"]:
            del sys.modules[name]

    if not hasattr(np, "int"):
        np.int = int  # removed alias used at reference gogame.py:250
    if not hasattr(np, "bool"):
        np.bool = bool  # removed alias used at reference gogame.py:261

    import scipy.ndimage as ndi

    if not hasattr(ndi, "measurements"):
        meas = types.ModuleType("scipy.ndimage.measurements")
        meas.label = ndi.label
        sys.modules["scipy.ndimage.measurements"] = meas
        ndi.measurements = meas

    pkg = types.ModuleType("gym_go")
    pkg.__path__ = [REFERENCE_PATH]
    sys.modules["gym_go"] = pkg

    import gym_go.gogame  # noqa: F401  (imports govars + state_utils too)

    return sys.modules["gym_go.gogame"]
