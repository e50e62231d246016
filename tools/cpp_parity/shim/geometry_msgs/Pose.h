#pragma once
// Stub: see shim/ros/ros.h.  Unused by the reference kernel layer.
