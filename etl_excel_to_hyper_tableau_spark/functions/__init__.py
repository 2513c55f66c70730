from .typemap import spark_type_to_hyper, spark_type_to_sqltype_name
from .hashing import md5_int64, minhash_signature, simhash64, char_ngrams

__all__ = [
    "spark_type_to_hyper", "spark_type_to_sqltype_name",
    "md5_int64", "minhash_signature", "simhash64", "char_ngrams",
]
