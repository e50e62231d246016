#pragma once
// Stub: included by surfel_map.h; the pcl stub's Ptr is std::shared_ptr.
