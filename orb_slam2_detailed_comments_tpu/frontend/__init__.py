from .tracking import Tracker, TrackingState, Sensor
