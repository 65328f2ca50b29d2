from .music import MusicKpiOutputs, run_music_pipeline
