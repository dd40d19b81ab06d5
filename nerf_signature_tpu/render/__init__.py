from .renderer import (
    RenderConfig,
    render_rays_fixed,
    render_rays_occ,
)
