from ttnx.ops.operators import *  # noqa: F401,F403
from ttnx.ops.qtt import *  # noqa: F401,F403
from ttnx.ops.fourier import *  # noqa: F401,F403
