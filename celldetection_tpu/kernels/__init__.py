from .nms_pallas import nms_pallas, pallas_available
