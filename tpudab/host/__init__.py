"""Host runtime: native library loading, IQ ingest, CLI apps, dashboard.

Replaces the reference's sdrpp_core host layer (SURVEY.md sec 2.6): IQ
file/socket readers, streaming loop, config, monitoring. The compute path
stays JAX/device; this layer is IO + orchestration (C where the reference's
runtime is C++).
"""
