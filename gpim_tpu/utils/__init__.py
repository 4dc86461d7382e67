"""
gpim_tpu.utils: grid/data preparation + visualization, mirroring the
reference's single ``gpim.gprutils`` namespace (gpim/__init__.py:1 re-exports
gprutils as ``gpim.utils``).
"""

from gpim_tpu.utils.gridutils import *  # noqa: F401,F403
from gpim_tpu.utils.viz import *  # noqa: F401,F403

from gpim_tpu.utils import gridutils as _g
from gpim_tpu.utils import viz as _v

__all__ = list(_g.__all__) + list(_v.__all__)
