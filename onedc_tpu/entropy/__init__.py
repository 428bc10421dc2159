from .bound import add_uniform_noise, lower_bound, ste_round  # noqa: F401
from .coder import EntropyCoder  # noqa: F401
from .framing import (  # noqa: F401
    decode_i,
    encode_i,
    filesize,
    get_downsampled_shape,
    get_padding_size,
    read_from_file,
    write_to_file,
)
from .gaussian import (  # noqa: F401
    GaussianConditionalCoder,
    build_gaussian_cdf_table,
    build_indexes,
    gaussian_bits,
    gaussian_prob,
    laplace_prob,
    probs_to_bits,
    scale_table,
)
