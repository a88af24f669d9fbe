"""Pallas TPU kernels for the hot CAVI inner loops.

TPU-native replacements for the reference's embedded OpenCL kernels
(gpuLDA.jl / gpuCTM.jl / gpuCTPF.jl string constants).  Each kernel
fuses what the reference split into several kernel launches and keeps
the per-document working set VMEM-resident across the whole E-step
fixpoint instead of round-tripping HBM every inner iteration.
"""
