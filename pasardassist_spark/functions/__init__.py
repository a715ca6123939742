from pasardassist_spark.functions.money import dec2, dec4, dsum, dsum_when
from pasardassist_spark.functions.chain import classify_transfer, uint256_hex

__all__ = ["dec2", "dec4", "dsum", "dsum_when", "classify_transfer", "uint256_hex"]
