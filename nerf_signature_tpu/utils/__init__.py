from .image import distortion_layer
