from .klu import (KLUSymbolic, KLUNumeric, klu_analyze, klu_factor,
                  klu_refactor, klu_solve, klu_rcond, klu_condest, klu_rgrowth)
