from . import exact, hamming, minhash, simhash  # noqa: F401
