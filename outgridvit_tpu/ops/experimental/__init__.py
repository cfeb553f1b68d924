"""Quarantined kernels: exact, tested, and A/B-settled LOSERS on current
TPU hardware (docs/PERFORMANCE.md "Same-window A/B campaign results").

Each kernel here was built against a real profiled bottleneck, is
numerically exact vs its XLA twin (tests keep running in interpret mode),
and lost its same-window alternating A/B on chip — typically because a
serial Pallas body forfeits the overlap XLA finds with neighboring ops.
They stay importable behind their env opt-ins (OUTGRIDVIT_DW_T,
OUTGRIDVIT_DW_BWD, OUTGRIDVIT_OUTAGG, outlook use_pallas) so future
hardware generations can re-run the A/Bs cheaply, but nothing in the
production dispatch defaults to them:

- dwconv_pallas_t.py   — transposed-layout dw-3x3 stencil (546 vs 749)
- dwconv_bwd_pallas.py — fused dw-3x3 backward (TIN-64 0.973x, flagship
                         0.862x, same-window)
- outlook_pallas.py    — monolithic outlook attention (slower on v5e)
- outlook_agg_pallas.py— fused aggregate[+value]+projection (0.848-0.984x
                         across configs/variants)
"""
