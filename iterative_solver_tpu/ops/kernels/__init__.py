from .gram_pallas import masked_gram_pallas
from .spmv_pallas import BSRMatrix, bsr_matmat, bsr_matmat_pallas

__all__ = ["BSRMatrix", "bsr_matmat", "bsr_matmat_pallas", "masked_gram_pallas"]
