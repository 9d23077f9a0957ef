"""PS1-authentic audio: tracker song model + SPU reverb/resampler DSP."""
