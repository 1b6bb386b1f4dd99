"""Sensor runtime: the headless sense-plan-integrate loop and replay driver
(ROS-free equivalents of the reference's ros/ nodes)."""
