"""The node library: every concrete signal type.

Layout mirrors the reference's ``src/signals/chain/`` modules (osc, fx,
noise, fixed, shape, files, vis, dev) plus two new modules the baseline
benchmark configs require — ``env`` (ADSR envelopes) and ``delay``
(delay lines / feedback, implementing the reference's declared-but-unused
CYCLIC flag).

Each node registers reference-framework qualified names as aliases so
``.sigs`` patches saved by the reference load unchanged.
"""
