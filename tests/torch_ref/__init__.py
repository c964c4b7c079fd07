"""Torch-side parity fixtures.

Pure-torch reimplementations (written from the math spec in SURVEY.md §2.2 and
the reference architecture descriptions) of the reference's MIL heads, with
state-dict key layouts identical to the reference models so the
``utils/torch_weights`` converters are exercised exactly as they would be on a
real reference checkpoint. Used by ``tests/test_parity_torch.py`` and
``tools/make_parity_fixtures.py``.
"""
