from wst_tpu.data.dataset import (load_rgb_image, load_area_images_and_labels,
                                  make_synthetic_dataset, list_areas)

__all__ = ["load_rgb_image", "load_area_images_and_labels",
           "make_synthetic_dataset", "list_areas"]
