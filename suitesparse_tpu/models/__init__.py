from .factorize import Factorize, backslash
from .spqr_rank import (spqr_basic, spqr_null, spqr_pinv, spqr_rank)
from . import csparse, ldl
