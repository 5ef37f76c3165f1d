from .seq import revcomp, normalize_vec, pretty_minvec  # noqa: F401
