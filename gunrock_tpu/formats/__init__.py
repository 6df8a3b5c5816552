from gunrock_tpu.formats.formats import (  # noqa: F401
    Coo,
    Csr,
    Csc,
    coo_to_csr,
    coo_to_csc,
    csr_to_coo,
    csr_to_csc,
)
