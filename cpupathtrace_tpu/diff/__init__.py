from .render import (
    DIFFERENTIABLE_FIELDS,
    apply_material_params,
    finite_difference_grad,
    get_material_params,
    image_loss,
    image_loss_unbiased,
    inverse_render,
    loss_and_grad,
    render_image_diff,
)
