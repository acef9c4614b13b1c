from . import langid, ppl, rules, scrub, shared, tokenize  # noqa: F401
