"""TPU Pallas kernels that survived measurement.

interp.py is the one Pallas kernel in production: the shared-window
multi-set fractional interpolation behind the mapped/formant plan stage
(default on TPU, tests/test_pallas_interp.py).

Two others were built, measured, and removed in round 4 (see docs/DESIGN.md
"Pallas verdicts" and git history @ 69726a8): a per-block prediction kernel
(relay DMA ~200 MB/s made it lose to the XLA scan) and a fused batched
sweep+unskew kernel (399.7 ms vs 125.8 ms for the XLA wavefront scan at
bench shapes; the sequential grid serializes what the scan overlaps).
"""
