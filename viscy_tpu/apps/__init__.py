"""Applications: cytoland (virtual staining), dynaclr (contrastive dynamics),
dynacell (benchmarks), qc."""
