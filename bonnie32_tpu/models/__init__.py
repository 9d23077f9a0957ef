"""Data model: scene building, levels, meshes, assets, textures."""
