from ttnx.cross.cross import (  # noqa: F401
    MaxVol,
    Greedy,
    DMRGCross,
    DMRG,
    MaxVolPivot,
    RandomPivot,
    tt_cross,
    tt_integrate,
    gauss_legendre,
)
from ttnx.cross.maxvol import maxvol  # noqa: F401
