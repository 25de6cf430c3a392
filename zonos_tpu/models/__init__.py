"""Model families: transformer / Mamba2-hybrid backbones, DAC codec, speaker tower."""
