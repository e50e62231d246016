#pragma once
// Stub: elements.h includes <ros/ros.h> but its structs use nothing from
// ROS.  Empty header so the unmodified reference source compiles without a
// ROS installation (tools/cpp_parity harness).
