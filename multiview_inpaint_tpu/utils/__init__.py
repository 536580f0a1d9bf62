from . import graphics, losses, quaternion, schedules, sh
