"""Pipeline models: stereo matcher, temporal matcher, motion tracker, BA."""
