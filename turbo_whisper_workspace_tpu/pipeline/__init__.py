"""Pipeline orchestration: transcribe → diarize → merge → enrich."""
