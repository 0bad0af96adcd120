from mlic_tpu.entropy.rans.coder import (  # noqa: F401
    BufferedRansEncoder,
    RansDecoder,
    encode_with_indexes,
    decode_with_indexes,
    rans_backend,
)

__all__ = ["BufferedRansEncoder", "RansDecoder", "encode_with_indexes", "decode_with_indexes", "rans_backend"]
