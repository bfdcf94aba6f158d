from .gram_pallas import masked_gram_pallas
from .spmv_pallas import (BSRMatrix, BSRMatrixInt8, bsr_matmat,
                          bsr_matmat_int8, bsr_matmat_pallas)

__all__ = ["BSRMatrix", "BSRMatrixInt8", "bsr_matmat", "bsr_matmat_int8",
           "bsr_matmat_pallas", "masked_gram_pallas"]
