"""Analysis layer: evaluation, frequency time series and plotting
(reference ``sykepic/analyze/``, library-only -- no CLI sub-command)."""
