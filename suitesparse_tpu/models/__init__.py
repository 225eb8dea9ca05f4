from .factorize import Factorize, backslash
from . import csparse, ldl
