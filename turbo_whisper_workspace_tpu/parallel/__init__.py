"""SPMD execution: device meshes, sharding specs, multi-host batch driver.

This whole subsystem is new capability relative to the reference, which
is single-process single-GPU (device="cuda:0" hard-coded at
vocalis/core/audio_pipeline.py:191) and loops over directories serially
(vocalis/security/security_monitor.py:371-381). See SURVEY.md §2.4.
"""
