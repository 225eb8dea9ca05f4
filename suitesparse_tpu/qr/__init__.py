from .spqr import (QRSymbolic, QRNumeric, qr_symbolic, qr_factorize,
                   qr_rsolve, qr_solve)
